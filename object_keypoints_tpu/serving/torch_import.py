"""torch -> flax weight import for reference checkpoints.

The reference trains in torch and its pretrained backbone loads from
``./models/corner_net.pkl`` (perception/models.py:69-78; the file is absent
upstream, but exported reference checkpoints follow the same state_dict
naming). This module maps a reference ``KeypointNet`` state_dict onto our
flax parameter tree so bit-level model parity against a reference-trained
checkpoint is checkable.

Name correspondence (reference -> here):
- ``backbone.pre.{0,1,2}``        -> ``backbone/pre_conv, pre_res1, pre_res2``
  (convolution k7/s2 + two stride-2 residuals, CornerNet_Squeeze.py:66-72)
- ``backbone.hgs.{s}`` recursive hg_module (modules.py:25-66 attribute
  names up1/low1/low2/low3/up2) -> ``backbone/hg_{s}`` FireHourglass
  (up1_{i}, low1_{i}, low2[_{i}], low3_{i}, up2)
- ``backbone.cnvs.{s}``           -> ``backbone/cnv_{s}``
- ``backbone.inters.{s}``         -> ``backbone/inter_res_{s}``
- ``backbone.inters_.{s}/cnvs_.{s}`` (1x1+BN merge, CornerNet_Squeeze.py:61-66)
                                  -> ``backbone/inter_merge_{s}, cnv_merge_{s}``
- ``{heatmap,depth,center}_head.output_head{1,2}.{0,1,2}``
  (perception/models.py:13-53)   -> ``{...}_head_{0,1}/conv{0,1,out}``

Tensor layout transforms:
- conv weight (O, I, kH, kW)      -> HWIO (kH, kW, I, O); the same transpose
  covers grouped convs ((O, I/g, kH, kW) -> (kH, kW, I/g, O)).
- ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose kernel
  (kH, kW, I, O) with the spatial taps FLIPPED (torch's transposed conv
  correlates with the unflipped kernel; lax.conv_transpose flips) —
  verified numerically in tests/test_torch_import.py.
- BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
  mean/var (batch_stats).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _k(prefix: str, suffix: str) -> str:
    """Join torch state_dict key parts (empty prefix => bare suffix)."""
    return f"{prefix}.{suffix}" if prefix else suffix


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy (no torch import needed)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    """(O, I[/g], kH, kW) -> (kH, kW, I[/g], O)."""
    return _t(w).transpose(2, 3, 1, 0)


def conv_transpose_kernel(w) -> np.ndarray:
    """(I, O, kH, kW) -> (kH, kW, I, O), spatially flipped (see module
    docstring)."""
    return _t(w).transpose(2, 3, 0, 1)[::-1, ::-1]


class _Importer:
    def __init__(self, state_dict: Dict[str, "np.ndarray"]):
        self.sd = {k: _t(v) for k, v in state_dict.items()}
        self.used = set()
        self.params: dict = {}
        self.stats: dict = {}

    def _take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    # -- leaf writers -------------------------------------------------
    def _set(self, tree: dict, path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, tkey: str, fpath: Tuple[str, ...], bias_key: str = None):
        self._set(self.params, fpath + ("kernel",), conv_kernel(self._take(tkey)))
        if bias_key is not None:
            self._set(self.params, fpath + ("bias",), self._take(bias_key))

    def conv_t(self, tprefix: str, fpath: Tuple[str, ...]):
        self._set(self.params, fpath + ("kernel",),
                  conv_transpose_kernel(self._take(_k(tprefix, "weight"))))
        self._set(self.params, fpath + ("bias",), self._take(_k(tprefix, "bias")))

    def bn(self, tprefix: str, fpath: Tuple[str, ...]):
        self._set(self.params, fpath + ("scale",), self._take(_k(tprefix, "weight")))
        self._set(self.params, fpath + ("bias",), self._take(_k(tprefix, "bias")))
        self._set(self.stats, fpath + ("mean",), self._take(_k(tprefix, "running_mean")))
        self._set(self.stats, fpath + ("var",), self._take(_k(tprefix, "running_var")))

    # -- reference blocks ----------------------------------------------
    def convolution(self, tp: str, fp: Tuple[str, ...]):
        """vendored `convolution` (utils.py:143-156) -> ConvBlock."""
        self.conv(_k(tp, "conv.weight"), fp + ("Conv_0",),
                  bias_key=_k(tp, "conv.bias") if _k(tp, "conv.bias") in self.sd else None)
        if _k(tp, "bn.weight") in self.sd:
            self.bn(_k(tp, "bn"), fp + ("BatchNorm_0",))

    def residual(self, tp: str, fp: Tuple[str, ...], has_skip: bool):
        """vendored `residual` (utils.py:158-185) -> Residual."""
        self.conv(_k(tp, "conv1.weight"), fp + ("Conv_0",))
        self.bn(_k(tp, "bn1"), fp + ("BatchNorm_0",))
        self.conv(_k(tp, "conv2.weight"), fp + ("Conv_1",))
        self.bn(_k(tp, "bn2"), fp + ("BatchNorm_1",))
        if has_skip:
            self.conv(_k(tp, "skip.0.weight"), fp + ("Conv_2",))
            self.bn(_k(tp, "skip.1"), fp + ("BatchNorm_2",))

    def fire(self, tp: str, fp: Tuple[str, ...]):
        """fire_module (CornerNet_Squeeze.py:10-30) -> FireModule."""
        self.conv(_k(tp, "conv1.weight"), fp + ("Conv_0",))
        self.bn(_k(tp, "bn1"), fp + ("BatchNorm_0",))
        self.conv(_k(tp, "conv_1x1.weight"), fp + ("Conv_1",))
        self.conv(_k(tp, "conv_3x3.weight"), fp + ("Conv_2",))
        self.bn(_k(tp, "bn2"), fp + ("BatchNorm_1",))

    def merge_mod(self, tp: str, fp: Tuple[str, ...]):
        """_merge_mod 1x1+BN (CornerNet_Squeeze.py:61-66) -> MergeBN."""
        self.conv(_k(tp, "0.weight"), fp + ("Conv_0",))
        self.bn(_k(tp, "1"), fp + ("BatchNorm_0",))

    def pred_module(self, tp: str, fp: Tuple[str, ...]):
        """prediction_module (perception/models.py:13-18) -> PredictionModule."""
        self.convolution(_k(tp, "0"), fp + ("conv0",))
        self.convolution(_k(tp, "1"), fp + ("conv1",))
        self.conv(_k(tp, "2.weight"), fp + ("conv_out",), bias_key=_k(tp, "2.bias"))

    def hg_module(self, tp: str, fp: Tuple[str, ...], level: int, mods):
        """Recursive hg_module (modules.py:25-66) -> FireHourglass."""
        curr_mod, next_mod = mods[0], mods[1]
        for i in range(curr_mod):
            self.fire(f"{tp}.up1.{i}", fp + (f"up1_{i}",))
            self.fire(f"{tp}.low1.{i}", fp + (f"low1_{i}",))
        if level > 1:
            self.hg_module(_k(tp, "low2"), fp + ("low2",), level - 1, mods[1:])
        else:
            for i in range(next_mod):
                self.fire(f"{tp}.low2.{i}", fp + (f"low2_{i}",))
        for i in range(curr_mod):
            self.fire(f"{tp}.low3.{i}", fp + (f"low3_{i}",))
        self.conv_t(_k(tp, "up2"), fp + ("up2",))

    def res_hg_module(self, tp: str, fp: Tuple[str, ...], level: int,
                      dims, mods):
        """Recursive hg_module/saccade_module with the RESIDUAL makers
        (CornerNet.py:10-16 / CornerNet_Saccade.py:10-16: pool = identity,
        low1 = stride-2 residual, unpool = parameterless nearest x2) ->
        models.hourglass.ResidualHourglass. Skip projections exist exactly
        where dims change or stride != 1 (utils.py:171-175)."""
        curr_dim, next_dim = dims[0], dims[1]
        curr_mod, next_mod = mods[0], mods[1]
        for i in range(curr_mod):
            self.residual(f"{tp}.up1.{i}", fp + (f"up1_{i}",), has_skip=False)
        self.residual(f"{tp}.low1.0", fp + ("low1_0",), has_skip=True)  # stride 2
        for i in range(1, curr_mod):
            self.residual(f"{tp}.low1.{i}", fp + (f"low1_{i}",), has_skip=False)
        if level > 1:
            self.res_hg_module(_k(tp, "low2"), fp + ("low2",), level - 1,
                               dims[1:], mods[1:])
        else:
            for i in range(next_mod):
                self.residual(f"{tp}.low2.{i}", fp + (f"low2_{i}",), has_skip=False)
        for i in range(curr_mod - 1):
            self.residual(f"{tp}.low3.{i}", fp + (f"low3_{i}",), has_skip=False)
        self.residual(f"{tp}.low3.{curr_mod - 1}", fp + (f"low3_{curr_mod - 1}",),
                      has_skip=next_dim != curr_dim)
        # up2 is nn.functional.interpolate - no parameters

    # -- detection-model blocks (corner_net_lite hg_net surface) -------
    def corner_pool_block(self, tp: str, fp: Tuple[str, ...]):
        """vendored `corner_pool` (py_utils/utils.py:187-226) ->
        models.cornernet.CornerPoolBlock (the pool ops themselves are
        parameterless)."""
        self.convolution(_k(tp, "p1_conv1"), fp + ("p1_conv1",))
        self.convolution(_k(tp, "p2_conv1"), fp + ("p2_conv1",))
        self.conv(_k(tp, "p_conv1.weight"), fp + ("p_conv1",))
        self.bn(_k(tp, "p_bn1"), fp + ("p_bn1",))
        self.conv(_k(tp, "conv1.weight"), fp + ("conv1",))
        self.bn(_k(tp, "bn1"), fp + ("bn1",))
        self.convolution(_k(tp, "conv2"), fp + ("conv2",))

    def det_pred_module(self, tp: str, fp: Tuple[str, ...]):
        """_pred_mod: convolution(with_bn=False, so the conv HAS bias) +
        1x1 conv (CornerNet_Squeeze.py:54-58) -> PredModule."""
        self.convolution(_k(tp, "0"), fp + ("conv0",))
        self.conv(_k(tp, "1.weight"), fp + ("conv_out",), bias_key=_k(tp, "1.bias"))


def import_keypoint_net(state_dict, stacks: int = 2, levels: int = 4,
                        mods=(2, 2, 2, 2, 4)) -> dict:
    """Reference KeypointNet torch state_dict -> flax variables
    {'params': ..., 'batch_stats': ...} for models.KeypointNet.

    Head keys (heatmap_head.* etc.) are optional — a bare CornerNet-Squeeze
    backbone (net.model.module.hg, keys hgs.pre... without the 'backbone.'
    prefix) imports too; pass its dict with keys prefixed 'backbone.'.
    """
    imp = _Importer(state_dict)

    # stem (pre.0/1/2)
    imp.convolution("backbone.pre.0", ("backbone", "pre_conv"))
    imp.residual("backbone.pre.1", ("backbone", "pre_res1"), has_skip=True)
    imp.residual("backbone.pre.2", ("backbone", "pre_res2"), has_skip=True)

    for s in range(stacks):
        imp.hg_module(f"backbone.hgs.{s}", ("backbone", f"hg_{s}"), levels,
                      tuple(mods))
        imp.convolution(f"backbone.cnvs.{s}", ("backbone", f"cnv_{s}"))
        if s < stacks - 1:
            imp.residual(f"backbone.inters.{s}", ("backbone", f"inter_res_{s}"),
                         has_skip=False)
            imp.merge_mod(f"backbone.inters_.{s}", ("backbone", f"inter_merge_{s}"))
            imp.merge_mod(f"backbone.cnvs_.{s}", ("backbone", f"cnv_merge_{s}"))

    for head in ("heatmap", "depth", "center"):
        for s in range(stacks):
            tp = f"{head}_head.output_head{s + 1}"
            if _k(tp, "0.conv.weight") in imp.sd:
                imp.pred_module(tp, (f"{head}_head_{s}",))

    unused = set(imp.sd) - imp.used
    unused = {k for k in unused if "num_batches_tracked" not in k}
    if unused:
        raise ValueError(f"unmapped reference keys: {sorted(unused)[:8]}"
                         f"{' ...' if len(unused) > 8 else ''}")
    return {"params": imp.params, "batch_stats": imp.stats}


def _import_detection_model(state_dict, *, stacks, stem_residuals, hourglass,
                            levels, dims, mods, att_levels: int = 0) -> dict:
    """Shared hg_net/saccade_net import: stem + hourglass stacks + corner
    pools + tl/br heat/tag/off heads (+ saccade attention heads).

    Key prefixes follow hg_net's attribute names (modules.py:95-117 /
    saccade_net :228-250): hg.pre / hg.hgs.{s} / hg.cnvs.{s} /
    hg.inters.{s} / hg.inters_.{s} / hg.cnvs_.{s}, then
    {tl,br}_modules.{s}, {tl,br}_{heats,tags,offs}.{s}, att_modules.{s}.{i}.
    """
    imp = _Importer(state_dict)

    imp.convolution("hg.pre.0", ("pre_conv",))
    for i in range(stem_residuals):
        imp.residual(f"hg.pre.{i + 1}", (f"pre_res{i + 1}",), has_skip=True)

    for s in range(stacks):
        if hourglass == "fire":
            imp.hg_module(f"hg.hgs.{s}", (f"hg_{s}",), levels, tuple(mods))
        else:
            imp.res_hg_module(f"hg.hgs.{s}", (f"hg_{s}",), levels,
                              tuple(dims), tuple(mods))
        imp.convolution(f"hg.cnvs.{s}", (f"cnv_{s}",))
        if s < stacks - 1:
            imp.residual(f"hg.inters.{s}", (f"inter_res_{s}",), has_skip=False)
            imp.merge_mod(f"hg.inters_.{s}", (f"inter_merge_{s}",))
            imp.merge_mod(f"hg.cnvs_.{s}", (f"cnv_merge_{s}",))
        for side in ("tl", "br"):
            imp.corner_pool_block(f"{side}_modules.{s}", (f"{side}_mod_{s}",))
            imp.det_pred_module(f"{side}_heats.{s}", (f"{side}_heat_{s}",))
            imp.det_pred_module(f"{side}_tags.{s}", (f"{side}_tag_{s}",))
            imp.det_pred_module(f"{side}_offs.{s}", (f"{side}_off_{s}",))
        for i in range(att_levels):
            imp.det_pred_module(f"att_modules.{s}.{i}", (f"att_{s}_{i}",))

    unused = set(imp.sd) - imp.used
    unused = {k for k in unused if "num_batches_tracked" not in k}
    if unused:
        raise ValueError(f"unmapped reference keys: {sorted(unused)[:8]}"
                         f"{' ...' if len(unused) > 8 else ''}")
    return {"params": imp.params, "batch_stats": imp.stats}


def import_cornernet_squeeze(state_dict) -> dict:
    """Vendored CornerNet_Squeeze detection model (CornerNet_Squeeze.py:
    53-111) -> flax variables for models.cornernet.cornernet_squeeze()."""
    return _import_detection_model(
        state_dict, stacks=2, stem_residuals=2, hourglass="fire",
        levels=4, dims=(256, 256, 384, 384, 512), mods=(2, 2, 2, 2, 4),
    )


def import_cornernet(state_dict) -> dict:
    """Vendored CornerNet detection model (CornerNet.py:18-71) -> flax
    variables for models.cornernet.cornernet()."""
    return _import_detection_model(
        state_dict, stacks=2, stem_residuals=1, hourglass="residual",
        levels=5, dims=(256, 256, 384, 384, 384, 512), mods=(2, 2, 2, 2, 2, 4),
    )


def import_cornernet_saccade(state_dict) -> dict:
    """Vendored CornerNet_Saccade detection model (CornerNet_Saccade.py:
    18-100: saccade_net with 3 per-level attention heads per stack) -> flax
    variables for models.cornernet.cornernet_saccade()."""
    return _import_detection_model(
        state_dict, stacks=3, stem_residuals=1, hourglass="residual",
        levels=3, dims=(256, 384, 384, 512), mods=(1, 1, 1, 1), att_levels=3,
    )
