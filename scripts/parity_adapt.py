#!/usr/bin/env python3
"""Adaptation-STEP numeric parity: multi-frame trajectory vs the torch
reference.

PARITY_E2E.md proves the *eval* pipeline end-to-end; this harness proves
the adaptation *train* step — multi-domain loss composition, gradients,
Adam update, EMA blend — over a multi-frame stream, against the
reference's own algorithm classes composed exactly like its adapt loop:

  torch side: CodepsNet (codeps/online_adap.py) built from the
    reference's DepthAlgo / SemanticSegAlgo / InstanceSegAlgo +
    DepthHead / PoseHead / SemanticHead / InstanceHead modules and
    torchvision-layout trunks (scripts/parity_e2e.build_torch_encoder),
    driven by a faithful replica of the per-frame loop of
    scripts/adapt_codeps.py:155-307 (teacher eval, mixup pseudo-labels,
    N optimizer steps with loss weighting, one EMA blend per frame).

  jax side: the SAME converted weights through tasks/adapt.make_adapt_step
    with the fused cut-mixup + in-step teacher eval — the exact
    executable AdaptationRunner dispatches per frame.

Both sides consume identical hand-built frame streams (pre-normalized
f32 images, pinned cut-mixup cells, pinned source/replay draws) so every
remaining delta is numerics, not data. Controlled randomness:

  - cut-mixup cells: traced ints on our side; np.random.choice is
    patched to replay the same cells on the torch side.
  - automask tie-break noise (algos/depth.py:316-318): zeroed on BOTH
    sides (torch.randn patched; reconstruction_loss called with
    identity_noise_scale=0) — the 1e-5 noise is framework-RNG-specific
    by construction and below every tolerance used here.

Variants:
  A "exact":     published config but backbone_pose_sflow ALSO frozen ->
                 every live module is BatchNorm-free, so our batching
                 deviations (pose-pair fold, merged target+replay) are
                 reduction-exact and the trajectories must agree to f32
                 accumulation noise.
  B "published": the published adapt_cityscapes_kitti_360 freezing
                 (pose backbone live). torch runs its train-mode BN on
                 the pooled pair batch vs our folded batch — this
                 variant MEASURES the documented deviation (CLAUDE.md)
                 instead of asserting equality.
  C "nsteps3":   variant A freezing, no mixup, nof_adaptation_steps=3 —
                 exercises the N-step accumulation + single EMA blend
                 (the reference would crash re-composing mixup at N>1:
                 online_adap.py:331-335 consumes the raw materials).

One reference quirk is deliberately not replicated: at frame 1 the
reference's student plabel pass (adapt_codeps.py:193-199) runs before
the first `frozen.eval()` call (adapt_codeps.py:261-265), so the frozen
backbone's BatchNorm briefly runs in train mode and its running stats
absorb one momentum update from the mixup batch. The harness pre-sets
frozen modules to eval so both stacks see the pretrained statistics.

Writes PARITY_ADAPT.md; exits non-zero if variant A or C exceed
 tolerance.
"""

import atexit
import contextlib
import functools
import os
import shutil
import sys
import tempfile
import types
from collections import OrderedDict
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
REFERENCE = "/root/reference"

import numpy as np  # noqa: E402

OFFSETS = (1,)
RGB_FRAME_OFFSETS = [0, -1, 1]
NC = 14
HT, WT = 64, 96     # target (stream) resolution
HS, WS = 64, 128    # source resolution (different, like the published cfg)
NS, NR, NM = 2, 2, 2
LOSS_KEYS = ("depth_recon", "depth_smth", "semantic_source",
             "semantic_cut_mixup", "center_source", "offset_source")

# Tolerances for the strict variants (A, C). f32 XLA-vs-torch summation
# order diverges across deep conv stacks + their backwards; the e2e
# harness bars (0.005 rel on depth preds) bound the same effect.
LOSS_RTOL = 5e-3
PARAM_ATOL = 1e-4      # |params_ours - params_torch| after the stream
ABS_REL_ATOL = 1e-3
CONF_FRAC = 2e-3       # fraction of pixels allowed to differ in sem_conf


# ------------------------------------------------------------ ref imports

def install_reference_stubs():
    """Make the reference packages importable without torchvision /
    kornia / yacs / skimage (none are installed; none are exercised by
    the code paths this harness runs)."""

    def module(name):
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        return mod

    if "torchvision" not in sys.modules:
        tv = module("torchvision")
        tv.__version__ = "0.0-stub"
        transforms = module("torchvision.transforms")

        def _unused(*args, **kwargs):
            raise RuntimeError("torchvision stub: not available")

        for name in ("Resize", "Compose", "Lambda", "Normalize",
                     "ToTensor", "ToPILImage", "InterpolationMode"):
            setattr(transforms, name, _unused)
        functional = module("torchvision.transforms.functional")
        transforms.functional = functional
        tv.transforms = transforms
        models = module("torchvision.models")

        class _StubResNet:  # only subclassed, never instantiated here
            def __init__(self, *args, **kwargs):
                raise RuntimeError("torchvision stub: not available")

        models.ResNet = _StubResNet
        tv.models = models

    if "kornia" not in sys.modules:
        kornia = module("kornia")
        contrib = module("kornia.contrib")
        # Faithful reimplementation of kornia's published conv-chamfer
        # algorithm (scripts/kornia_dt.py) so the reference's
        # conf_instance_mixup paste-offset path (mixup.py:587-590) runs
        # end-to-end; codeps_tpu.data.mixup.kornia_dist_row's closed
        # form is pinned to the same oracle by
        # test_replay_buffer.py::test_conf_instance_dt_vs_kornia_algo.
        sys.path.insert(0, str(REPO / "scripts"))
        from kornia_dt import torch_distance_transform
        contrib.distance_transform = torch_distance_transform
        kornia.contrib = contrib

    if "yacs" not in sys.modules:
        from codeps_tpu.config import ConfigNode
        yacs = module("yacs")
        ycfg = module("yacs.config")
        ycfg.CfgNode = ConfigNode
        yacs.config = ycfg

    if "skimage" not in sys.modules:
        skimage = module("skimage")
        exposure = module("skimage.exposure")

        def match_histograms(*args, **kwargs):
            raise RuntimeError("skimage stub: not used by this harness")

        exposure.match_histograms = match_histograms
        skimage.exposure = exposure

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


# ------------------------------------------------------------- rng pinning

@contextlib.contextmanager
def pinned_cut_cells(cells_rows):
    """Replay pre-drawn cut-mixup cells through np.random.choice
    (Mixup._get_cut_msk draws one row per sample, mixup.py:106)."""
    queue = list(cells_rows)
    orig = np.random.choice

    def fake_choice(a, size=None, replace=True, p=None):
        assert queue, "more np.random.choice calls than pinned cells"
        return np.asarray(queue.pop(0))

    np.random.choice = fake_choice
    try:
        yield queue
    finally:
        np.random.choice = orig


@contextlib.contextmanager
def zero_torch_randn(torch):
    """Zero the automask tie-break noise (algos/depth.py:316-318)."""
    orig = torch.randn

    def fake_randn(*shape, **kwargs):
        kwargs.pop("generator", None)
        return torch.zeros(*shape, **kwargs)

    torch.randn = fake_randn
    try:
        yield
    finally:
        torch.randn = orig


# ---------------------------------------------------------------- configs

def make_cfg(freeze_pose: bool, num_mixup: int, nsteps: int,
             strategies=None):
    from codeps_tpu.config import gen_config

    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.pose_sflow_net.params.nof_layers = 18
    cfg.model.make_sflow = False
    cfg.semantics.class_weights = [1.0] * NC
    cfg.dataset.remove_classes = []
    cfg.dataset.feed_img_size = [HT, WT]
    cfg.adapt.source_dataset.feed_img_size = [HS, WS]
    cfg.adapt.model.backbone_po_depth = False
    cfg.adapt.model.backbone_pose_sflow = not freeze_pose
    cfg.adapt.model.depth = True
    cfg.adapt.model.pose = True
    cfg.adapt.model.sflow = False
    cfg.adapt.model.semantic = True
    cfg.adapt.model.instance = False
    cfg.adapt.ema.semantic = True
    cfg.adapt.ema.instance = False
    cfg.adapt.ema.alpha = 0.99
    if strategies is None:
        strategies = ["cut_mixup"] * num_mixup
    cfg.adapt.mixup.general.active = num_mixup > 0
    cfg.adapt.mixup.general.nof_samples = num_mixup
    cfg.adapt.mixup.general.mixup_strategies = list(strategies)
    cfg.adapt.mixup.general.geom_augment = True
    cfg.adapt.mixup.cut_mix.nof_hor_splits = 4
    cfg.adapt.mixup.cut_mix.nof_vert_splits = 2
    cfg.adapt.mixup.cut_mix.nof_segments = 2
    cfg.train.nof_adaptation_steps = nsteps
    cfg.tpu.compute_dtype = "float32"
    cfg.freeze()

    frozen = ["backbone_po_depth"]
    if freeze_pose:
        frozen.append("backbone_pose_sflow")
    frozen.append("instance_head")
    return cfg, frozen


def frozen_to_ema_lists(frozen):
    """ema_modules / inverted lists (adapt_codeps.py:57-69)."""
    ema_modules = ["semantic_head"]
    inverted = ["backbone_po_depth", "backbone_pose_sflow", "depth_head",
                "pose_head", "semantic_head", "instance_head"]
    for module in ema_modules + list(frozen):
        if module in inverted:
            inverted.remove(module)
    return ema_modules, inverted


# ------------------------------------------------------------ frame stream

def smooth_image(rng, height, width, channels=3):
    """Smooth random image so warps/gradients are well-conditioned."""
    import cv2
    coarse = rng.uniform(0.05, 0.95,
                         (height // 8, width // 8, channels))
    img = cv2.resize(coarse, (width, height),
                     interpolation=cv2.INTER_LINEAR)
    if channels == 1:
        img = img[..., None]
    return img.astype(np.float32)


def make_stream(seed, num_frames, num_mix=NM):
    """Pre-generate every array both stacks consume.

    Frames axis order [t, t-1, t+1]; offsets channel order (dy, dx);
    cameras are (fx, fy, cx, cy) rows (misc/camera_model.py:26-29).
    ``num_mix`` mixup samples are generated; targets are assigned
    [online, replay0, replay1, ...] (replay_buffer.py:248-256
    prioritizes the online image first).
    """
    rng = np.random.default_rng(seed)
    cam_t = np.asarray([48.0, 48.0, WT / 2, HT / 2], np.float32)
    cam_s = np.asarray([60.0, 60.0, WS / 2, HS / 2], np.float32)

    def triplet(h, w):
        base = smooth_image(rng, h, w)
        shift = rng.integers(1, 3)
        prev = np.roll(base, shift, axis=1) + 0.02 * smooth_image(rng, h, w)
        nxt = np.roll(base, -shift, axis=1) + 0.02 * smooth_image(rng, h, w)
        return np.stack([base, np.clip(prev, 0, 1), np.clip(nxt, 0, 1)])

    frames = []
    for _ in range(num_frames):
        frame = {
            "target_frames": triplet(HT, WT)[None],            # (1,3,H,W,3)
            "target_camera": cam_t[None],
            "target_semantic": rng.integers(
                0, NC, (1, HT, WT)).astype(np.int32),
            "target_depth": rng.uniform(
                1.0, 60.0, (1, HT, WT)).astype(np.float32),
            "source_frames": np.stack(
                [triplet(HS, WS) for _ in range(NS)]),
            "source_camera": np.tile(cam_s[None], (NS, 1)),
            "source_semantic": rng.integers(
                0, NC, (NS, HS, WS)).astype(np.int32),
            "source_center": np.stack(
                [smooth_image(rng, HS, WS, 1) for _ in range(NS)]),
            "source_offset": rng.normal(
                0, 4, (NS, HS, WS, 2)).astype(np.float32),
            "replay_frames": np.stack(
                [triplet(HT, WT) for _ in range(NR)]),
            "replay_camera": np.tile(cam_t[None], (NR, 1)),
            "mix_rgb_src": np.stack(
                [smooth_image(rng, HS, WS) for _ in range(num_mix)]),
            "mix_semantic_src": rng.integers(
                0, NC, (num_mix, HS, WS)).astype(np.int32),
            "mix_instance_src": rng.integers(
                0, 5, (num_mix, HS, WS)).astype(np.int32),
            "mix_camera_src": np.tile(cam_s[None], (num_mix, 1)),
            "cut_cells": np.stack([
                rng.choice(8, 2, replace=False) for _ in range(num_mix)
            ]).astype(np.int32),
        }
        # mixup targets: online frame t first, then replay frames
        # (replay_buffer.py:248-256 prioritizes the online image first)
        tgt_pool = [frame["target_frames"][0, 0]] + [
            frame["replay_frames"][i, 0] for i in range(NR)]
        frame["mix_rgb_tgt"] = np.stack(
            [tgt_pool[i % len(tgt_pool)] for i in range(num_mix)])
        frame["mix_camera_tgt"] = np.stack([cam_t] * num_mix)
        # class_mixup replace-set pick: indices into the SORTED unique
        # classes of that sample's source labels (_get_rnd_cls,
        # mixup.py:68-74) — pre-drawn here, replayed through BOTH stacks.
        frame["class_picks"] = []
        for i in range(num_mix):
            uniq = np.unique(frame["mix_semantic_src"][i])
            num = uniq.shape[0]
            frame["class_picks"].append(
                rng.choice(num, (num + num % 2) // 2,
                           replace=False).astype(np.int64))
        frames.append(frame)
    return frames


# ------------------------------------------------------------- torch stack

def build_torch_model(torch, cfg, seed):
    """Reference CodepsNet from its own algos/heads + trunk encoders."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity_e2e", str(REPO / "scripts" / "parity_e2e.py"))
    pe = importlib.util.module_from_spec(spec)
    sys.modules["parity_e2e"] = pe
    spec.loader.exec_module(pe)

    import algos
    from codeps.online_adap import CodepsNet
    from eval import DepthEvaluator, PanopticEvaluator, SemanticEvaluator
    from models import DepthHead, InstanceHead, PoseHead, SemanticHead

    torch.manual_seed(seed)
    num_ch_enc = np.array([64, 64, 128, 256, 512])
    backbone_po_depth = pe.build_torch_encoder(torch)
    backbone_pose_sflow = pe.build_torch_encoder(torch, in_channels=6)
    depth_head = DepthHead(num_ch_enc, use_skips=True)
    pose_head = PoseHead(num_ch_enc, num_input_features=1,
                         num_frames_to_predict_for=2)
    semantic_head = SemanticHead(
        num_ch_enc, NC, use_skips=True,
        use_guda_fusion=cfg.model.semantic_head.use_guda_fusion)
    instance_head = InstanceHead(num_ch_enc, use_thing_mask=False)
    pe.randomize_bn_stats(torch, backbone_po_depth, seed + 1)
    pe.randomize_bn_stats(torch, backbone_pose_sflow, seed + 2)
    pe.randomize_bn_stats(torch, instance_head, seed + 3)

    device = torch.device("cpu")
    ssim = algos.SSIMLoss()
    recon_t = algos.ReconstructionLoss(WT, HT, ssim,
                                       cfg.depth.num_recon_scales, device)
    recon_s = algos.ReconstructionLoss(WS, HS, ssim,
                                       cfg.depth.num_recon_scales, device)
    depth_eval = DepthEvaluator(cfg.eval.depth.use_gt_scale,
                                tuple(cfg.eval.depth.depth_ranges))
    depth_algo = algos.DepthAlgo(recon_t,
                                 algos.EdgeAwareSmoothnessLoss(),
                                 depth_eval, None, None, recon_s, "codeps")
    sem_loss = algos.SemanticLoss(
        device=device, class_weights=list(cfg.semantics.class_weights),
        top_k_percent_pixels=cfg.semantics.top_k, ignore_labels=None)
    sem_algo = algos.SemanticSegAlgo(
        sem_loss, SemanticEvaluator(num_classes=NC, ignore_classes=[]))
    from codeps_tpu.data.labels import stuff_classes, thing_classes
    things = list(thing_classes("codeps", []))
    stuffs = list(stuff_classes("codeps", []))
    instance_algo = algos.InstanceSegAlgo(
        algos.CenterLoss(), algos.OffsetLoss(),
        PanopticEvaluator(stuff_list=stuffs, thing_list=things,
                          label_divisor=1000, void_label=-1),
        algos.BinaryMaskLoss())

    def to_namespace(node):
        """deepcopy-safe attribute view of a ConfigNode subtree
        (CodepsNet stores cfg_mixup and ema_model deep-copies it)."""
        try:
            items = dict(node.items())
        except AttributeError:
            return node
        return types.SimpleNamespace(
            **{k: to_namespace(v) for k, v in items.items()})

    model = CodepsNet(cfg_mixup=to_namespace(cfg.adapt.mixup),
                      backbone_po_depth=backbone_po_depth,
                      backbone_pose_sflow=backbone_pose_sflow,
                      depth_head=depth_head, pose_head=pose_head,
                      flow_head=None, semantic_head=semantic_head,
                      instance_head=instance_head, depth_algo=depth_algo,
                      semantic_algo=sem_algo, instance_algo=instance_algo)
    return model, (things, stuffs)


def torch_in_data(torch, frame, with_mixup, strategies=None):
    """The collated reference adapt sample (train_utils.py:81-114).

    ``strategies`` switches to the multi-strategy layout: one in_data
    key PER strategy name (replay_buffer.py:260-263 groups samples
    under their strategy key), each holding that strategy's batch —
    here one sample per strategy, mixup sample i -> strategies[i]."""

    def chw(x):
        return torch.tensor(np.ascontiguousarray(
            np.moveaxis(x, -1, -3)), dtype=torch.float32)

    def rgb_dict(frames_bfhwc):
        return {0: chw(frames_bfhwc[:, 0]), -1: chw(frames_bfhwc[:, 1]),
                1: chw(frames_bfhwc[:, 2])}

    in_data = {
        "target": {
            "rgb": rgb_dict(frame["target_frames"]),
            "camera_model": torch.tensor(frame["target_camera"]),
            "semantic": torch.tensor(
                frame["target_semantic"].astype(np.int64)),
            "depth": torch.tensor(frame["target_depth"]),
        },
        "source": {
            "rgb": rgb_dict(frame["source_frames"]),
            "camera_model": torch.tensor(frame["source_camera"]),
            # uint8 like the real datasets (semantic maps are stored
            # uint8; SemanticLoss .long()s internally)
            "semantic": torch.tensor(
                frame["source_semantic"].astype(np.uint8)),
            "semantic_weights": torch.ones((NS, HS, WS)),
            "center": chw(frame["source_center"]),
            "offset": chw(frame["source_offset"]),
        },
        "target_replay": {
            "rgb": rgb_dict(frame["replay_frames"]),
            "camera_model": torch.tensor(frame["replay_camera"]),
        },
    }
    if with_mixup and strategies is None:
        in_data["cut_mixup"] = {
            "rgb_src": {0: chw(frame["mix_rgb_src"])},
            "rgb_tgt": {0: chw(frame["mix_rgb_tgt"])},
            "semantic_src": torch.tensor(
                frame["mix_semantic_src"].astype(np.uint8)).unsqueeze(1),
            "instance_src": torch.tensor(
                frame["mix_instance_src"]).unsqueeze(1),
            "camera_model_src": torch.tensor(frame["mix_camera_src"]),
            "camera_model_tgt": torch.tensor(frame["mix_camera_tgt"]),
            "tgt_is_replay": torch.tensor([0, 1]),
        }
    elif with_mixup:
        for i, strategy in enumerate(strategies):
            sl = slice(i, i + 1)
            in_data[strategy] = {
                "rgb_src": {0: chw(frame["mix_rgb_src"][sl])},
                "rgb_tgt": {0: chw(frame["mix_rgb_tgt"][sl])},
                "semantic_src": torch.tensor(
                    frame["mix_semantic_src"][sl].astype(
                        np.uint8)).unsqueeze(1),
                "instance_src": torch.tensor(
                    frame["mix_instance_src"][sl]).unsqueeze(1),
                "camera_model_src": torch.tensor(
                    frame["mix_camera_src"][sl]),
                "camera_model_tgt": torch.tensor(
                    frame["mix_camera_tgt"][sl]),
                "tgt_is_replay": torch.tensor([0 if i == 0 else 1]),
            }
    return in_data


def structure_instance_head(torch, model, rgb_frames, seed, steps=80):
    """Overfit the instance head to synthetic multi-blob center/offset GT
    on the given frames (N, H, W, 3).

    Why: with purely random weights the center heatmap is f32-scale
    noise, and the 7x7 NMS of panoptic fusion
    (post_processing_panoptic.py:31-70) then picks peaks by comparisons
    whose margins sit BELOW the torch-vs-XLA conv-stack noise (measured:
    1.5e-8 margin vs ~6e-8 output diff) — one flipped peak renumbers
    every later instance id. Structured center maps give the fusion
    real peaks with healthy margins, so the variant-D composed-instance
    check exercises the ALGORITHM, not float tie-breaking. Encoder
    features stay fixed (eval, no grad); only instance_head trains."""
    import torch.nn.functional as F
    gen = np.random.default_rng(seed + 77)
    n, height, width = rgb_frames.shape[:3]
    centers_gt = np.zeros((n, 1, height, width), np.float32)
    offsets_gt = np.zeros((n, 2, height, width), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(n):
        pts = np.stack([gen.uniform(6, height - 6, 5),
                        gen.uniform(6, width - 6, 5)], -1)
        d2 = ((yy[None] - pts[:, 0, None, None]) ** 2
              + (xx[None] - pts[:, 1, None, None]) ** 2)
        centers_gt[i, 0] = np.exp(-d2 / (2 * 4.0 ** 2)).sum(0).clip(0, 1)
        nearest = d2.argmin(0)
        offsets_gt[i, 0] = pts[nearest, 0] - yy
        offsets_gt[i, 1] = pts[nearest, 1] - xx
    images = torch.tensor(np.ascontiguousarray(
        np.moveaxis(rgb_frames, -1, 1)))
    center_t = torch.tensor(centers_gt)
    offset_t = torch.tensor(offsets_gt)
    model.backbone_po_depth.eval()
    with torch.no_grad():
        feats = [f.detach() for f in model.backbone_po_depth(images)]
    model.instance_head.train()
    opt = torch.optim.Adam(model.instance_head.parameters(), lr=1e-3)
    for _ in range(steps):
        opt.zero_grad()
        center, offset, _ = model.instance_head(feats)
        loss = (200.0 * F.mse_loss(center, center_t)
                + 0.05 * F.l1_loss(offset, offset_t))
        loss.backward()
        opt.step()
    model.instance_head.eval()


def run_torch(torch, cfg, frozen, frames, nsteps, with_mixup, seed,
              strategies=None):
    """Faithful replica of the reference per-frame adaptation loop
    (scripts/adapt_codeps.py:155-307) on the fixed stream."""
    from codeps.online_adap import CodepsNet

    model, _ = build_torch_model(torch, cfg, seed)
    if strategies is not None:
        # Variant D: structured center maps for fusion-stable
        # composed-instance comparison (see structure_instance_head).
        structure_instance_head(
            torch, model,
            np.concatenate([f["mix_rgb_tgt"] for f in frames]), seed)
    for name, param in model.named_parameters():
        if any(name.startswith(m) for m in frozen):
            param.requires_grad = False
    # pre-set frozen modules to eval (see module docstring: the frame-1
    # train-mode plabel quirk is deliberately not replicated)
    model.train()
    for m in frozen:
        getattr(model, m).eval()

    ckpt = {"state_dict": {
        name: getattr(model, name).state_dict()
        for name in ("backbone_po_depth", "backbone_pose_sflow",
                     "depth_head", "pose_head", "semantic_head",
                     "instance_head")}}
    ckpt_dir = Path(tempfile.mkdtemp(prefix="parity_adapt_"))
    atexit.register(shutil.rmtree, str(ckpt_dir), ignore_errors=True)
    ckpt_path = ckpt_dir / "w.pth"
    torch.save(ckpt, str(ckpt_path))

    optimizer = torch.optim.Adam(model.parameters(),
                                 lr=cfg.train.optimizer.learning_rate)
    ema_modules, ema_inverted = frozen_to_ema_lists(frozen)
    ema_model = CodepsNet.ema_model(model)
    ema_alpha = cfg.adapt.ema.alpha
    loss_weights = {k: v for k, v in cfg.losses.weights.items()}

    records = []
    for frame in frames:
        in_data = torch_in_data(torch, frame, with_mixup, strategies)
        rec = {"losses": [], "eval": {}}

        # teacher eval + mixup pseudo-labels (adapt_codeps.py:166-199)
        ema_model.eval()
        with torch.no_grad():
            _, _, stats_eval = ema_model(in_data["target"], "eval",
                                         RGB_FRAME_OFFSETS, False, False)
            for key, item in in_data.items():
                if key.endswith("mixup"):
                    _, plabel, _ = ema_model(item, "eval",
                                             RGB_FRAME_OFFSETS, False,
                                             False)
                    item["semantic_pred_tgt_ema"] = \
                        plabel["semantic"].detach().clone()
            for key, item in in_data.items():
                if key.endswith("mixup"):
                    _, plabel, _ = model(item, "eval", RGB_FRAME_OFFSETS,
                                         False, False)
                    item["center_pred_tgt_ema"] = \
                        plabel["center"].detach().clone()
                    item["offset_pred_tgt_ema"] = \
                        plabel["offset"].detach().clone()
        rec["eval"]["d_abs_rel"] = float(stats_eval["d_abs_rel"])
        rec["eval"]["sem_conf"] = np.asarray(
            stats_eval["sem_conf"].to(torch.int64))

        # adaptation steps (adapt_codeps.py:260-299)
        model.train()
        for m in frozen:
            getattr(model, m).eval()
        for _ in range(nsteps):
            optimizer.zero_grad()
            # np.random.choice replay queue, in the forward's in_data
            # iteration order: cut_mixup draws its cell row
            # (mixup.py:106), class_mixup its replace-set indices
            # (mixup.py:72); conf_instance_mixup draws nothing.
            if not with_mixup:
                cells = []
            elif strategies is None:
                cells = [row for row in frame["cut_cells"]]
            else:
                cells = []
                for i, strategy in enumerate(strategies):
                    if strategy == "cut_mixup":
                        cells.append(frame["cut_cells"][i])
                    elif strategy == "class_mixup":
                        cells.append(frame["class_picks"][i])
            with pinned_cut_cells(cells), zero_torch_randn(torch):
                losses, results, _, in_data = model(
                    in_data, "adapt", RGB_FRAME_OFFSETS,
                    do_panoptic_fusion=False)
            if strategies is not None:
                # Composed mixup batches (do_mixup replaced in_data[key])
                # for the composition-level parity table.
                rec.setdefault("composed", {})
                for key in strategies:
                    rec["composed"][key] = {
                        "rgb": np.moveaxis(np.asarray(
                            in_data[key]["rgb"][0].detach()), 1, -1),
                        "semantic": np.asarray(
                            in_data[key]["semantic"].detach()),
                        "instance": np.asarray(
                            in_data[key]["instance"].detach()),
                    }
            for name in losses.keys():
                if loss_weights.get(name) is None:
                    losses[name] = None
            step_record = {
                k: float(v.mean()) for k, v in losses.items()
                if v is not None}
            rec["losses"].append(step_record)
            weighted = OrderedDict(
                (k, v.mean()) for k, v in losses.items()
                if v is not None and v.requires_grad)
            if weighted:
                total = sum(loss_weights[name] * loss
                            for name, loss in weighted.items())
                total.backward()
                optimizer.step()
        feats = results["image_features"]           # (1, C, h, w)
        pooled = feats.mean(dim=(2, 3))
        pooled = pooled / pooled.norm(dim=1, keepdim=True).clamp_min(1e-12)
        rec["features"] = pooled.numpy()
        # single EMA blend per frame (adapt_codeps.py:294-299)
        ema_model.update_weights(model, ema_modules, ema_alpha)
        ema_model.update_weights(model, ema_inverted, 0)
        records.append(rec)

    final = {
        "student": {name: getattr(model, name).state_dict()
                    for name in ckpt["state_dict"]},
        "ema": {name: getattr(ema_model, name).state_dict()
                for name in ckpt["state_dict"]},
    }
    return str(ckpt_path), records, final


# --------------------------------------------------------------- jax stack

def run_jax(cfg, frozen, frames, nsteps, with_mixup, ckpt_path,
            strategies=None):
    import jax.numpy as jnp

    import codeps_tpu.tasks.adapt as adapt_mod
    from codeps_tpu.data.labels import thing_classes
    from codeps_tpu.io import pretrained_from_checkpoints
    from codeps_tpu.losses import reconstruction_loss
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import build_optimizer, make_adapt_state
    from codeps_tpu.tasks.adapt import build_eval_forward, make_adapt_step

    modules = build_modules(cfg, NC, dtype=jnp.float32)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (HT, WT))
    params, stats = pretrained_from_checkpoints(
        [ckpt_path], params, stats, cfg)

    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(7),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen,
                             ema_alpha=cfg.adapt.ema.alpha)

    things = tuple(thing_classes("codeps", []))
    eval_forward = build_eval_forward(modules, cfg, things, ())
    # The noise-zeroing patch must stay live through the FIRST step()
    # call: jax.jit traces lazily, and _depth_domain resolves the
    # module-global reconstruction_loss at TRACE time — restoring the
    # original right after make_adapt_step (which traces nothing) would
    # leave the 1e-5 automask tie-break noise active on the jax side
    # while the torch side's randn is zeroed.
    orig_recon = adapt_mod.reconstruction_loss
    adapt_mod.reconstruction_loss = functools.partial(
        reconstruction_loss, identity_noise_scale=0.0)
    composer = None
    if strategies is not None:
        # Host-composed mixup (the production non-fused path,
        # AdaptationRunner._compose_mixups): the fused teacher
        # pseudo-label + panoptic-fusion + c2c-warp device program, then
        # per-strategy numpy composition with the pinned RNG draws.
        from codeps_tpu.data.mixup import Mixup
        from codeps_tpu.tasks.mixup_prep import (c2c_prewarp,
                                                 make_plabel_prep_step)
        plabel_prep = make_plabel_prep_step(modules, things, (HS, WS),
                                            geom_augment=True)
        cfg_mix = cfg.adapt.mixup

        def composer(st, frame):
            warp = jax.tree.map(jnp.asarray, c2c_prewarp(
                frame["mix_camera_tgt"], frame["mix_camera_src"],
                (HT, WT), (HS, WS)))
            rgb_w, sem_w, inst_w = plabel_prep(
                st.ema_params, st.ema_batch_stats,
                jnp.asarray(frame["mix_rgb_tgt"]), warp)
            rgb_w, sem_w, inst_w = (np.asarray(rgb_w), np.asarray(sem_w),
                                    np.asarray(inst_w))
            composed = {}
            for i, strategy in enumerate(strategies):
                rng = _ReplayRNG([frame["cut_cells"][i]
                                  if strategy == "cut_mixup"
                                  else frame["class_picks"][i]])
                img_src = frame["mix_rgb_src"][i]
                sem_src = frame["mix_semantic_src"][i]
                inst_src = frame["mix_instance_src"][i]
                if strategy == "cut_mixup":
                    out = Mixup.cut_mixup(
                        rng, img_src, rgb_w[i], inst_src, sem_src,
                        sem_w[i], inst_w[i],
                        cfg_mix.cut_mix.nof_vert_splits,
                        cfg_mix.cut_mix.nof_hor_splits,
                        cfg_mix.cut_mix.nof_segments)
                elif strategy == "class_mixup":
                    out = Mixup.class_mixup(rng, img_src, rgb_w[i],
                                            inst_src, sem_src,
                                            sem_w[i], inst_w[i])
                else:
                    out = Mixup.conf_instance_mixup(
                        img_src, rgb_w[i], inst_src, sem_src,
                        sem_w[i], inst_w[i],
                        cfg_mix.conf_instance_mix.min_inst_size,
                        thing_list=things, num_classes=NC,
                        conf_thresh=cfg_mix.conf_instance_mix.conf_thresh)
                composed[strategy] = {"rgb": out[0], "semantic": out[1],
                                      "instance": out[2]}
            return composed

    try:
        step = make_adapt_step(
            modules, cfg, tx,
            class_weights=list(cfg.semantics.class_weights),
            ema_modules=("semantic_head",), frozen_modules=frozen,
            has_replay=True,
            num_mixup=(len(strategies) if strategies is not None
                       else NM) if with_mixup else 0,
            mixup_groups=(tuple((s, 1) for s in strategies)
                          if strategies is not None else None),
            fused_mixup=with_mixup and strategies is None,
            sem_ignore_classes=None,
            donate=False, eval_forward=eval_forward)
        state, records = _run_jax_frames(step, state, frames, nsteps,
                                         with_mixup, composer, strategies)
    finally:
        adapt_mod.reconstruction_loss = orig_recon
    return state, records


class _ReplayRNG:
    """np.random.Generator stand-in replaying pre-drawn arrays through
    .choice — the jax-side twin of pinned_cut_cells."""

    def __init__(self, queue):
        self.queue = list(queue)

    def choice(self, a, size=None, replace=True, p=None):
        assert self.queue, "more rng.choice calls than pinned draws"
        return np.asarray(self.queue.pop(0))


def _run_jax_frames(step, state, frames, nsteps, with_mixup,
                    composer=None, strategies=None):
    import jax.numpy as jnp
    records = []
    for frame in frames:
        batch = {
            "target": {
                "frames": jnp.asarray(frame["target_frames"]),
                "camera": jnp.asarray(frame["target_camera"]),
            },
            "source": {
                "frames": jnp.asarray(frame["source_frames"]),
                "camera": jnp.asarray(frame["source_camera"]),
                "semantic": jnp.asarray(frame["source_semantic"]),
                "semantic_weights": jnp.ones((NS, HS, WS), jnp.float32),
                "center": jnp.asarray(frame["source_center"]),
                "offset": jnp.asarray(frame["source_offset"]),
            },
            "target_replay": {
                "frames": jnp.asarray(frame["replay_frames"]),
                "camera": jnp.asarray(frame["replay_camera"]),
            },
            "eval_gt": {
                "semantic": jnp.asarray(frame["target_semantic"]),
                "depth_gt": jnp.asarray(frame["target_depth"]),
            },
        }
        rec = {"losses": [], "eval": {}}
        if with_mixup and composer is not None:
            composed = composer(state, frame)
            rec["composed"] = composed
            batch["mixup"] = {
                "rgb": jnp.asarray(np.stack(
                    [composed[s]["rgb"] for s in strategies])),
                "semantic": jnp.asarray(np.stack(
                    [composed[s]["semantic"] for s in strategies]).astype(
                        np.int32)),
            }
        elif with_mixup:
            from codeps_tpu.tasks.mixup_prep import c2c_prewarp
            batch["mixup"] = {
                "rgb_src": jnp.asarray(frame["mix_rgb_src"]),
                "semantic_src": jnp.asarray(frame["mix_semantic_src"]),
                "rgb_tgt": jnp.asarray(frame["mix_rgb_tgt"]),
                "prewarp": jax.tree.map(jnp.asarray, c2c_prewarp(
                    frame["mix_camera_tgt"], frame["mix_camera_src"],
                    frame["mix_rgb_tgt"].shape[1:3],
                    frame["mix_rgb_src"].shape[1:3])),
                "cut_cells": jnp.asarray(frame["cut_cells"]),
            }
        for step_i in range(nsteps):
            batch["do_ema"] = np.asarray(step_i == nsteps - 1)
            state, metrics, feats, eval_results, eval_stats = \
                step(state, batch)
            rec["losses"].append({
                k: float(v) for k, v in metrics.items()
                if k in LOSS_KEYS and np.ndim(np.asarray(v)) == 0})
            if step_i == 0:
                rec["eval"]["d_abs_rel"] = float(eval_stats["d_abs_rel"])
                rec["eval"]["sem_conf"] = np.asarray(
                    eval_stats["sem_conf"]).astype(np.int64)
        rec["features"] = np.asarray(feats)
        records.append(rec)

    return state, records


# -------------------------------------------------------------- comparison

def tree_diff_vector(tree_a, tree_b):
    leaves_a = jax.tree.leaves(tree_a)
    leaves_b = jax.tree.leaves(tree_b)
    assert len(leaves_a) == len(leaves_b)
    if not leaves_a:
        return np.zeros((0,), np.float64)
    return np.concatenate([
        np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64)
               ).ravel() for x, y in zip(leaves_a, leaves_b)])


def compare_params(cfg, torch_state_dicts, jax_params, jax_stats):
    """Convert the torch module state -> flax layout, tree-diff.

    Returns per-module {max, p999} plus pooled stats. Interpretation:
    Adam's first-moment normalization makes the step-1 update exactly
    +-lr*sign(g) per param, so a parameter whose torch-vs-jax gradient
    differs in SIGN (only possible where |g| is at f32 noise level)
    lands 2*lr apart while every well-conditioned parameter agrees to
    ~1e-6. The honest bars are therefore a tight percentile band plus a
    2*lr-per-step ceiling, not a single max.
    """
    from codeps_tpu.io.convert_pth import convert_checkpoint

    tp, ts = convert_checkpoint({"state_dict": torch_state_dicts}, cfg)
    per_module = {}
    pooled = []
    for name in tp:
        vec = tree_diff_vector(tp[name], jax_params[name])
        pooled.append(vec)
        per_module[name] = {
            "max": float(vec.max()) if vec.size else 0.0,
            "p999": float(np.percentile(vec, 99.9)) if vec.size else 0.0,
        }
    vec = np.concatenate(pooled)
    del ts, jax_stats  # BN buffers compared only at init (never updated)
    return per_module, {
        "max": float(vec.max()),
        "p999": float(np.percentile(vec, 99.9)),
        "frac_above_1em5": float(np.mean(vec > 1e-5)),
    }


def run_variant(torch, tag, freeze_pose, num_frames, nsteps, with_mixup,
                seed=11, strategies=None):
    num_mix = len(strategies) if strategies is not None else NM
    cfg, frozen = make_cfg(freeze_pose, num_mix if with_mixup else 0,
                           nsteps, strategies=strategies)
    frames = make_stream(seed, num_frames, num_mix=num_mix)
    ckpt_path, torch_recs, torch_final = run_torch(
        torch, cfg, frozen, frames, nsteps, with_mixup, seed,
        strategies=strategies)
    jax_state, jax_recs = run_jax(cfg, frozen, frames, nsteps,
                                  with_mixup, ckpt_path,
                                  strategies=strategies)

    weights = {k: v for k, v in cfg.losses.weights.items()}
    rows = []
    max_rel = 0.0
    for f, (tr, jr) in enumerate(zip(torch_recs, jax_recs)):
        for s, (tl, jl) in enumerate(zip(tr["losses"], jr["losses"])):
            for key in LOSS_KEYS:
                if key not in tl and key not in jl:
                    continue
                tv, jv = tl.get(key), jl.get(key)
                if tv is None or jv is None:
                    rows.append((f, s, key, tv, jv, float("inf")))
                    max_rel = float("inf")
                    continue
                rel = abs(tv - jv) / max(abs(tv), 1e-8)
                max_rel = max(max_rel, rel)
                rows.append((f, s, key, tv, jv, rel))
            # comparable weighted total over the shared term set
            t_tot = sum((weights.get(k) or 0.0) * v
                        for k, v in tl.items())
            j_tot = sum((weights.get(k) or 0.0) * v
                        for k, v in jl.items())
            rel = abs(t_tot - j_tot) / max(abs(t_tot), 1e-8)
            max_rel = max(max_rel, rel)
            rows.append((f, s, "weighted_total", t_tot, j_tot, rel))

    composed_diffs = None
    if strategies is not None:
        # Composition-level parity: the torch stack's do_mixup output
        # (mixup.py:405-489, incl. kornia-oracle conf paste offsets)
        # vs our host-composed batches (plabel_prep + data/mixup.py).
        composed_diffs = {s: {"rgb_max": 0.0, "sem_frac": 0.0,
                              "inst_frac": 0.0} for s in strategies}
        for tr, jr in zip(torch_recs, jax_recs):
            for s in strategies:
                tc, jc = tr["composed"][s], jr["composed"][s]
                d = composed_diffs[s]
                d["rgb_max"] = max(d["rgb_max"], float(np.max(np.abs(
                    tc["rgb"][0] - jc["rgb"]))))
                d["sem_frac"] = max(d["sem_frac"], float(np.mean(
                    tc["semantic"][0].astype(np.int64)
                    != jc["semantic"].astype(np.int64))))
                d["inst_frac"] = max(d["inst_frac"], float(np.mean(
                    tc["instance"][0].astype(np.int64)
                    != jc["instance"].astype(np.int64))))

    eval_abs_rel = max(abs(tr["eval"]["d_abs_rel"] - jr["eval"]["d_abs_rel"])
                       for tr, jr in zip(torch_recs, jax_recs))
    conf_frac = max(
        float(np.abs(tr["eval"]["sem_conf"]
                     - jr["eval"]["sem_conf"]).sum())
        / float(tr["eval"]["sem_conf"].sum())
        for tr, jr in zip(torch_recs, jax_recs))
    feat_diff = max(
        float(np.max(np.abs(tr["features"] - jr["features"])))
        for tr, jr in zip(torch_recs, jax_recs))

    student_diffs, student_pooled = compare_params(
        cfg, torch_final["student"], jax_state.params,
        jax_state.batch_stats)
    ema_diffs, ema_pooled = compare_params(
        cfg, torch_final["ema"], jax_state.ema_params,
        jax_state.ema_batch_stats)
    return {
        "tag": tag,
        "rows": rows,
        "composed_diffs": composed_diffs,
        "max_loss_rel": max_rel,
        "eval_abs_rel": eval_abs_rel,
        "conf_frac": conf_frac,
        "feat_diff": feat_diff,
        "student_diffs": student_diffs,
        "ema_diffs": ema_diffs,
        "student_pooled": student_pooled,
        "ema_pooled": ema_pooled,
        "lr": cfg.train.optimizer.learning_rate,
        "frozen": frozen,
        "num_frames": num_frames,
        "nsteps": nsteps,
    }


def format_variant(res, strict):
    lines = [f"### Variant {res['tag']} "
             f"({res['num_frames']} frames x {res['nsteps']} steps, "
             f"frozen: {', '.join(res['frozen'])})", ""]
    lines.append("| frame | step | term | torch | jax | rel diff |")
    lines.append("|---|---|---|---|---|---|")
    for f, s, key, tv, jv, rel in res["rows"]:
        tvs = "None" if tv is None else f"{tv:.6f}"
        jvs = "None" if jv is None else f"{jv:.6f}"
        lines.append(f"| {f} | {s} | {key} | {tvs} | {jvs} | {rel:.2e} |")
    lines.append("")
    lines.append("| check | value | bar | pass |")
    lines.append("|---|---|---|---|")

    def check(name, value, bar, fmt="{:.3e}"):
        ok = value <= bar if strict else True
        mark = ("yes" if value <= bar else "NO") if strict \
            else f"(report-only: {'within' if value <= bar else 'beyond'})"
        lines.append(f"| {name} | {fmt.format(value)} | {bar} | {mark} |")
        return ok if strict else True

    total_steps = res["num_frames"] * res["nsteps"]
    # Adam moves a param by at most ~lr per step (bias-corrected
    # m/sqrt(v) is +-1 at step 1 and |update| <= ~lr after), so two
    # trajectories whose gradients only disagree in sign on
    # noise-level-|g| params stay within 2*lr*steps; systematic bugs
    # are NOT bounded by this. Pair it with a tight 99.9% band.
    flip_bound = 2.2 * res["lr"] * total_steps
    band = 2e-5 * total_steps

    ok = True
    if res.get("composed_diffs"):
        for s, d in res["composed_diffs"].items():
            ok &= check(f"{s} composed rgb max |diff|", d["rgb_max"],
                        1e-5)
            ok &= check(f"{s} composed semantic mismatch frac",
                        d["sem_frac"], 0.0)
            ok &= check(f"{s} composed instance mismatch frac",
                        d["inst_frac"], 0.0)
    ok &= check("max loss-term rel diff", res["max_loss_rel"], LOSS_RTOL)
    ok &= check("teacher eval d_abs_rel abs diff", res["eval_abs_rel"],
                ABS_REL_ATOL)
    ok &= check("teacher eval sem_conf pixel-frac diff",
                res["conf_frac"], CONF_FRAC)
    ok &= check("replay feature vector max diff", res["feat_diff"], 1e-3)
    ok &= check("student param p99.9 |delta| after stream",
                res["student_pooled"]["p999"], band)
    ok &= check("student param max |delta| (sign-flip ceiling "
                "2.2*lr*steps)", res["student_pooled"]["max"], flip_bound)
    ok &= check("student frac(|delta| > 1e-5)",
                res["student_pooled"]["frac_above_1em5"], 1e-3)
    ok &= check("EMA param p99.9 |delta| after stream",
                res["ema_pooled"]["p999"], band)
    ok &= check("EMA param max |delta|", res["ema_pooled"]["max"],
                flip_bound)
    lines.append("")
    lines.append("Per-module student / EMA max |delta|: " + "; ".join(
        f"{name} {res['student_diffs'][name]['max']:.2e} / "
        f"{res['ema_diffs'][name]['max']:.2e}"
        for name in sorted(res["student_diffs"])))
    lines.append("")
    return lines, ok


def run(num_frames=3, out_md="PARITY_ADAPT.md",
        variants=("A", "B", "C", "D")):
    install_reference_stubs()
    import torch
    torch.set_num_threads(max(os.cpu_count() or 1, 1))

    results = []
    if "A" in variants:
        results.append((run_variant(torch, "A exact (pose frozen)",
                                    freeze_pose=True,
                                    num_frames=num_frames, nsteps=1,
                                    with_mixup=True), True))
    if "B" in variants:
        results.append((run_variant(
            torch, "B published freezing (pose live, measures the "
            "train-mode-BN fold deviation)", freeze_pose=False,
            num_frames=num_frames, nsteps=1, with_mixup=True), False))
    if "C" in variants:
        # One frame fewer than A/B keeps the 3-steps-per-frame variant's
        # wall-clock comparable while still honoring the caller's knob.
        results.append((run_variant(torch, "C nof_adaptation_steps=3",
                                    freeze_pose=True,
                                    num_frames=max(num_frames - 1, 1),
                                    nsteps=3, with_mixup=False), True))
    if "D" in variants:
        # All three mixup strategies through BOTH stacks (VERDICT r4 #4):
        # torch runs its own Mixup.do_mixup (kornia oracle injected for
        # the conf_instance distance transform); jax runs the production
        # host path (plabel_prep + data/mixup.py). Strict bars, plus the
        # composition-level table (composed rgb/semantic/instance per
        # strategy). One sample per strategy: cut_mixup gets the online
        # target, class/conf_instance the replay frames.
        results.append((run_variant(
            torch, "D all mixup strategies (host path)",
            freeze_pose=True, num_frames=num_frames, nsteps=1,
            with_mixup=True,
            strategies=("cut_mixup", "class_mixup",
                        "conf_instance_mixup")), True))

    lines = [
        "# PARITY_ADAPT — adaptation-step numeric parity vs the torch "
        "reference",
        "",
        "Same converted weights, same hand-built frame stream, pinned "
        "cut-mixup cells, zeroed tie-break noise, through BOTH "
        "adaptation stacks end-to-end (teacher eval -> multi-domain "
        "losses -> grad -> Adam -> EMA). torch side: the reference's "
        "own algos/heads driven like scripts/adapt_codeps.py:155-307. "
        "jax side: tasks/adapt.make_adapt_step (fused cut-mixup + "
        "in-step eval), the production executable.",
        "",
    ]
    all_ok = True
    for res, strict in results:
        vlines, ok = format_variant(res, strict)
        lines.extend(vlines)
        all_ok &= ok
    lines.append(f"Verdict: {'PASS' if all_ok else 'FAIL'}")
    lines.append("")
    lines.append("Reproduce: `python scripts/parity_adapt.py`")
    Path(out_md).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    return all_ok


if __name__ == "__main__":
    frames = int(os.environ.get("PARITY_ADAPT_FRAMES", "3"))
    variants = tuple(os.environ.get("PARITY_ADAPT_VARIANTS", "ABCD"))
    ok = run(num_frames=frames, variants=variants)
    sys.exit(0 if ok else 1)
