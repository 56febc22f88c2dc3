"""Native C++ data-IO: build, load, subsample semantics, numpy parity."""
import numpy as np
import pytest

from cagroup3d_tpu.datasets import native_io


def make_files(tmp_path, sizes=(500, 3000)):
    paths, ins_paths = [], []
    rng = np.random.RandomState(0)
    for i, n in enumerate(sizes):
        pts = rng.rand(n, 6).astype(np.float32)
        p = tmp_path / f"s{i}.bin"
        pts.tofile(p)
        paths.append(str(p))
        ins = rng.randint(0, 10, n).astype(np.int64)
        ip = tmp_path / f"i{i}.bin"
        ins.tofile(ip)
        ins_paths.append(str(ip))
    return paths, ins_paths


def test_native_build_and_load(tmp_path):
    assert native_io.available(), "C++ dataio failed to build"
    paths, ins_paths = make_files(tmp_path)
    pts, valid, ins, sem = native_io.load_batch(paths, 1024,
                                                ins_paths=ins_paths)
    assert pts.shape == (2, 1024, 6)
    # scene 0 has 500 points -> 500 valid, exact copy
    assert valid[0].sum() == 500
    ref = np.fromfile(paths[0], np.float32).reshape(-1, 6)
    np.testing.assert_array_equal(pts[0, :500], ref)
    ref_ins = np.fromfile(ins_paths[0], np.int64)
    np.testing.assert_array_equal(ins[0, :500], ref_ins)
    # scene 1 has 3000 -> subsampled to 1024 distinct rows of the source
    assert valid[1].sum() == 1024
    src = np.fromfile(paths[1], np.float32).reshape(-1, 6)
    sub = pts[1][valid[1].astype(bool)]
    # every sampled row exists in the source and rows are distinct
    src_set = {tuple(np.round(r, 6)) for r in src}
    rows = [tuple(np.round(r, 6)) for r in sub]
    assert all(r in src_set for r in rows)
    assert len(set(rows)) == len(rows)


def test_missing_file_raises(tmp_path):
    if not native_io.available():
        pytest.skip("no toolchain")
    with pytest.raises(IOError):
        native_io.load_batch([str(tmp_path / "nope.bin")], 64)
