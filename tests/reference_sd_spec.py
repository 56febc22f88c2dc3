"""Reference CAGroup3D checkpoint SPEC: enumerate the exact state_dict
keys + shapes a reference-trained torch checkpoint contains, derived
from the reference module structure — NOT from our model's key names
(that would make the dress rehearsal circular).

Sources (reference file:line):
  * pcdet/models/backbones_3d/biresnet.py:8-103 (BasicBlock/Bottleneck),
    105-203 (DAPPM), 245-333 (BiResNet layer stacks)
  * pcdet/models/dense_heads/cagroup_head.py:113-188 (_make_block*,
    _make_offset_block, _init_layers — per-class ModuleLists)
  * pcdet/models/roi_heads/cagroup_roi_head.py:20-37 (SimplePoolingLayer)
    and 156-184 (reg_fc stack, reg_pred_layer)
  * pcdet/models/model_utils/cagroup_utils.py:69-84 (Scale)

MinkowskiEngine 0.5.x storage conventions:
  * MinkowskiConvolution(bias=False by default).kernel: (K^3, Cin, Cout)
    for kernel_size>1, (Cin, Cout) for kernel_size==1; kernel offsets
    enumerated with the FIRST spatial axis fastest
  * conv bias (when bias=True): shape (1, Cout)
  * MinkowskiBatchNorm wraps nn.BatchNorm1d under a ".bn." prefix:
    .bn.weight/.bias/.running_mean/.running_var/.num_batches_tracked
  * Generative/plain ConvolutionTranspose kernels: (K^3, Cin, Cout)
torch conventions: Linear.weight (out, in); BatchNorm1d flat keys.
"""
import numpy as np


class SpecBuilder:
    def __init__(self):
        self.shapes = {}   # name -> shape tuple

    def conv(self, name, cin, cout, k, bias=False):
        self.shapes[f"{name}.kernel"] = \
            (cin, cout) if k == 1 else (k ** 3, cin, cout)
        if bias:
            self.shapes[f"{name}.bias"] = (1, cout)

    def bn(self, name, n):
        """MinkowskiBatchNorm: nn.BatchNorm1d under .bn."""
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            self.shapes[f"{name}.bn.{leaf}"] = (n,)
        self.shapes[f"{name}.bn.num_batches_tracked"] = ()

    def bn1d(self, name, n):
        """plain nn.BatchNorm1d (the RoI head's reg_fc stack)."""
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            self.shapes[f"{name}.{leaf}"] = (n,)
        self.shapes[f"{name}.num_batches_tracked"] = ()

    def linear(self, name, cin, cout, bias):
        self.shapes[f"{name}.weight"] = (cout, cin)
        if bias:
            self.shapes[f"{name}.bias"] = (cout,)


def _basic_block(b, name, cin, cout, downsample):
    # biresnet.py:24-28
    b.conv(f"{name}.conv1", cin, cout, 3)
    b.bn(f"{name}.norm1", cout)
    b.conv(f"{name}.conv2", cout, cout, 3)
    b.bn(f"{name}.norm2", cout)
    if downsample:  # biresnet.py:337-343
        b.conv(f"{name}.downsample.0", cin, cout, 1)
        b.bn(f"{name}.downsample.1", cout)


def _bottleneck(b, name, cin, cmid, downsample):
    # biresnet.py:66-79 (expansion 2)
    b.conv(f"{name}.conv1", cin, cmid, 1)
    b.bn(f"{name}.norm1", cmid)
    b.conv(f"{name}.conv2", cmid, cmid, 3)
    b.bn(f"{name}.norm2", cmid)
    b.conv(f"{name}.conv3", cmid, cmid * 2, 1)
    b.bn(f"{name}.norm3", cmid * 2)
    if downsample:
        b.conv(f"{name}.downsample.0", cin, cmid * 2, 1)
        b.bn(f"{name}.downsample.1", cmid * 2)


def biresnet_spec(b, pre, in_ch=3, out_ch=64, planes=64, spp_planes=128):
    hp = planes * 2
    # stem (biresnet.py:245-254): conv, BN, ReLU, conv, BN, ReLU
    b.conv(f"{pre}.conv1.0", in_ch, planes, 3)
    b.bn(f"{pre}.conv1.1", planes)
    b.conv(f"{pre}.conv1.3", planes, planes, 3)
    b.bn(f"{pre}.conv1.4", planes)
    # low-res trunk layer1-4: 2 BasicBlocks, first strided w/ downsample
    for i, (cin, cout) in enumerate([(planes, planes), (planes, planes * 2),
                                     (planes * 2, planes * 4),
                                     (planes * 4, planes * 8)], start=1):
        _basic_block(b, f"{pre}.layer{i}.0", cin, cout, downsample=True)
        _basic_block(b, f"{pre}.layer{i}.1", cout, cout, downsample=False)
    # high-res branch (biresnet.py:299-305): stride-1, no downsample
    _basic_block(b, f"{pre}.layer3_.0", planes * 2, hp, downsample=False)
    _basic_block(b, f"{pre}.layer3_.1", hp, hp, downsample=False)
    _basic_block(b, f"{pre}.layer4_.0", hp, hp, downsample=False)
    _basic_block(b, f"{pre}.layer4_.1", hp, hp, downsample=False)
    # bottleneck tails (expansion 2 always forces a downsample)
    _bottleneck(b, f"{pre}.layer5_.0", hp, hp, downsample=True)
    _bottleneck(b, f"{pre}.layer5.0", planes * 8, planes * 8,
                downsample=True)
    # cross-branch fusion (biresnet.py:271-296)
    b.conv(f"{pre}.compression3.0", planes * 4, hp, 1)
    b.bn(f"{pre}.compression3.1", hp)
    b.conv(f"{pre}.compression4.0", planes * 8, hp, 1)
    b.bn(f"{pre}.compression4.1", hp)
    b.conv(f"{pre}.down3.0", hp, planes * 4, 3)
    b.bn(f"{pre}.down3.1", planes * 4)
    b.conv(f"{pre}.down4.0", hp, planes * 4, 3)
    b.bn(f"{pre}.down4.1", planes * 4)
    b.conv(f"{pre}.down4.3", planes * 4, planes * 8, 3)
    b.bn(f"{pre}.down4.4", planes * 8)
    # DAPPM (biresnet.py:105-175); inplanes = planes*16 post-layer5
    spp_in, spp_out = planes * 16, planes * 4
    b.bn(f"{pre}.spp.scale0.0", spp_in)
    b.conv(f"{pre}.spp.scale0.2", spp_in, spp_planes, 1)
    for s in (1, 2, 3, 4):
        b.bn(f"{pre}.spp.scale{s}.1", spp_in)     # idx0 is the AvgPool
        b.conv(f"{pre}.spp.scale{s}.3", spp_in, spp_planes, 1)
        b.bn(f"{pre}.spp.process{s}.0", spp_planes)
        b.conv(f"{pre}.spp.process{s}.2", spp_planes, spp_planes, 3)
    b.bn(f"{pre}.spp.compression.0", spp_planes * 5)
    b.conv(f"{pre}.spp.compression.2", spp_planes * 5, spp_out, 1)
    b.bn(f"{pre}.spp.shortcut.0", spp_in)
    b.conv(f"{pre}.spp.shortcut.2", spp_in, spp_out, 1)
    # output head (biresnet.py:311-318): transpose k2s2, BN, ReLU, k1, BN
    b.conv(f"{pre}.out.0", spp_out, spp_out, 2)   # kernel (8, C, C)
    b.bn(f"{pre}.out.1", spp_out)
    b.conv(f"{pre}.out.3", spp_out, out_ch, 1)
    b.bn(f"{pre}.out.4", out_ch)


def dense_head_spec(b, pre, n_classes, n_reg_outs, with_yaw, ch=64,
                    cls_kernel=9, expand=3):
    # offset_block (cagroup_head.py:163-172): k1, BN, ELU, k1, BN, ELU, k1
    b.conv(f"{pre}.offset_block.0", ch, ch, 1)
    b.bn(f"{pre}.offset_block.1", ch)
    b.conv(f"{pre}.offset_block.3", ch, ch, 1)
    b.bn(f"{pre}.offset_block.4", ch)
    b.conv(f"{pre}.offset_block.6", ch, 9 if with_yaw else 3, 1)
    # feature_offset (cagroup_head.py:176): k3 block to (3x)ch
    fo = 3 * ch if with_yaw else ch
    b.conv(f"{pre}.feature_offset.0", ch, fo, 3)
    b.bn(f"{pre}.feature_offset.1", fo)
    # shared 1x1 heads (cagroup_head.py:179-183)
    b.conv(f"{pre}.semantic_conv", ch, n_classes, 1, bias=True)
    b.conv(f"{pre}.centerness_conv", ch, 1, 1)
    b.conv(f"{pre}.reg_conv", ch, n_reg_outs, 1)
    b.conv(f"{pre}.cls_conv", ch, n_classes, 1, bias=True)
    for i in range(n_classes):
        b.shapes[f"{pre}.scales.{i}.scale"] = ()   # cagroup_utils.py:69
        # cls_individual_out: k=CLS_KERNEL block (conv, BN, ELU)
        b.conv(f"{pre}.cls_individual_out.{i}.0", ch, ch, cls_kernel)
        b.bn(f"{pre}.cls_individual_out.{i}.1", ch)
        # cls_individual_up: [GenerativeConvTranspose(k=s=expand),
        #                     Sequential(BN, ELU)] (cagroup_head.py:146-160)
        b.conv(f"{pre}.cls_individual_up.{i}.0", ch, ch, expand)
        b.bn(f"{pre}.cls_individual_up.{i}.1.0", ch)
        b.conv(f"{pre}.cls_individual_fuse.{i}.0", ch * 2, ch, 1)
        b.bn(f"{pre}.cls_individual_fuse.{i}.1", ch)
        b.conv(f"{pre}.cls_individual_expand_out.{i}.0", ch, ch, 5)
        b.bn(f"{pre}.cls_individual_expand_out.{i}.1", ch)


def roi_head_spec(b, pre, code_size, sincos, mlps=((64, 128, 128),),
                  reg_fc=(256, 256), roi_conv_kernel=5, grid_size=7,
                  dp_ratio=0.3):
    # SimplePoolingLayer (cagroup_roi_head.py:32-37)
    for i, mlp in enumerate(mlps):
        p = f"{pre}.roi_grid_pool_layers.{i}"
        b.conv(f"{p}.grid_conv", mlp[0], mlp[1], roi_conv_kernel)
        b.bn(f"{p}.grid_bn", mlp[1])
        b.conv(f"{p}.pooling_conv", mlp[1], mlp[2], grid_size)
        b.bn(f"{p}.pooling_bn", mlp[1])
    # reg_fc stack (cagroup_roi_head.py:168-179): Linear(bias=False),
    # BN1d, ReLU [, Dropout for non-last when dp_ratio>0] per layer
    pre_ch = sum(m[-1] for m in mlps)
    idx = 0
    for k, width in enumerate(reg_fc):
        b.linear(f"{pre}.reg_fc_layers.{idx}", pre_ch, width, bias=False)
        b.bn1d(f"{pre}.reg_fc_layers.{idx + 1}", width)
        idx += 3                                    # Linear, BN, ReLU
        if k != len(reg_fc) - 1 and dp_ratio > 0:
            idx += 1                                # Dropout
        pre_ch = width
    out = code_size + 1 if sincos else code_size
    b.linear(f"{pre}.reg_pred_layer", pre_ch, out, bias=True)


def cagroup3d_reference_sd(dataset="scannet", seed=0):
    """Full reference-model state_dict {name: np.ndarray} with random
    values, for the scannet or sunrgbd CAGroup3D config."""
    b = SpecBuilder()
    if dataset == "scannet":
        n_classes, n_reg, with_yaw, code, sincos = 18, 6, False, 6, False
    else:
        n_classes, n_reg, with_yaw, code, sincos = 10, 8, True, 7, True
    biresnet_spec(b, "backbone_3d")
    dense_head_spec(b, "dense_head", n_classes, n_reg, with_yaw)
    roi_head_spec(b, "roi_head", code, sincos)
    rs = np.random.RandomState(seed)
    sd = {}
    for name, shape in b.shapes.items():
        if name.endswith("num_batches_tracked"):
            sd[name] = np.int64(rs.randint(100, 10000))
        elif name.endswith("running_var"):
            sd[name] = np.asarray(0.5 + rs.rand(*shape), np.float32)
        else:
            sd[name] = np.asarray(rs.randn(*shape) * 0.05, np.float32)
    return sd
