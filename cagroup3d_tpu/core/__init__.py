from .sparse import SparseTensor, make_empty, PAD_COORD
from .hashing import build_index, lookup, pack_coords
from .voxelize import unique_voxels, voxelize_points, stride_reduce_coords
from .kernel_maps import kernel_offsets, conv_offsets, transpose_offsets, neighbor_table
from .sparse_conv import gather_gemm, subm_conv, strided_conv, conv_at_coords, transposed_conv
from .pooling import avg_pool, interpolate_at
from . import geometry, nms
from .module import Ctx, Params
