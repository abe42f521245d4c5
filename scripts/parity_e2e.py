#!/usr/bin/env python3
"""End-to-end metric parity: this repo vs the PyTorch reference.

Runs the SAME weights on the SAME frames through both eval pipelines and
compares the headline metrics against the BASELINE.md tolerances
(PQ within 0.5, abs_rel within 0.005):

  torch side: a torchvision-layout ResNet-18 encoder (local, the
    reference's encoder wraps torchvision which is not installed) +
    the reference's own DepthHead / SemanticHead / InstanceHead modules
    (imported from /root/reference/models/*.py), the reference panoptic
    post-processing (misc/post_processing_panoptic.py) and evaluators
    (eval/depth.py, eval/semantic.py, eval/panoptic.py) — i.e. the
    reference's "eval" forward (codeps/online_adap.py:142-181) plus the
    GT-fusion metric protocol of the adaptation loop
    (scripts/adapt_codeps.py:201-255).

  jax side: the torch checkpoint converted with io/convert_pth.py and
    evaluated with tasks/adapt.make_eval_step + our evaluators — the
    exact production path of the adaptation loop.

Frames come from a synthetic KITTI-360 tree (file-layout-faithful,
codeps_tpu/data/synthetic.py), streamed through our Kitti360 loader in
sequence mode. Weights are seeded-random with non-trivial BN statistics,
exercising the full conversion surface.

Writes PARITY_E2E.md and exits non-zero if any delta exceeds tolerance.
"""

import os
import sys
import tempfile
from pathlib import Path

# Force the CPU platform (the container pins JAX_PLATFORMS=axon and
# sitecustomize imports jax before this script runs, so the env var
# alone is not enough — override the jax config too, like
# tests/conftest.py): this comparison is f32 CPU vs torch CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import numpy as np

PQ_TOL = 0.5        # BASELINE.md: PQ within 0.5 (percentage points)
ABS_REL_TOL = 0.005  # BASELINE.md: abs_rel within 0.005
MIOU_TOL = 0.005     # same spirit for mIoU (fractional)


# --------------------------------------------------------- torch encoder

def build_torch_encoder(torch, num_layers=18, in_channels=3):
    """torchvision-layout ResNet trunk wrapped like the reference's
    ResnetEncoder (models/resnet_encoder.py:82-126): state_dict keys are
    'encoder.conv1.weight', 'encoder.layer1.0.conv1.weight', ... so
    io/convert_pth.convert_resnet_encoder consumes it unchanged.

    ``num_layers`` 18 (BasicBlock) or 50/101 (Bottleneck, torchvision
    expansion-4 layout — the reference's production depth/semantic
    backbone, resnet_encoder.py:92-94); ``in_channels=6`` mirrors the
    num_input_images=2 pose/sflow variant (resnet_multiimage_input,
    models/resnet_encoder.py:58-79)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    block = {18: BasicBlock, 50: Bottleneck, 101: Bottleneck}[num_layers]
    depths = {18: [2, 2, 2, 2], 50: [3, 4, 6, 3],
              101: [3, 4, 23, 3]}[num_layers]

    class ResNetTrunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64
            for idx, (planes, stride, count) in enumerate(
                    zip([64, 128, 256, 512], [1, 2, 2, 2], depths)):
                downsample = None
                out_ch = planes * block.expansion
                if stride != 1 or inplanes != out_ch:
                    downsample = nn.Sequential(
                        nn.Conv2d(inplanes, out_ch, 1, stride,
                                  bias=False),
                        nn.BatchNorm2d(out_ch))
                blocks = [block(inplanes, planes, stride, downsample)]
                blocks += [block(out_ch, planes)
                           for _ in range(count - 1)]
                setattr(self, f"layer{idx + 1}", nn.Sequential(*blocks))
                inplanes = out_ch

    class RefEncoder(nn.Module):
        """Mirrors ResnetEncoder.forward (resnet_encoder.py:115-126)."""

        def __init__(self):
            super().__init__()
            self.encoder = ResNetTrunk()

        def forward(self, x):
            feats = []
            x = self.encoder.conv1(x)
            x = self.encoder.bn1(x)
            feats.append(self.encoder.relu(x))
            feats.append(self.encoder.layer1(self.encoder.maxpool(feats[-1])))
            feats.append(self.encoder.layer2(feats[-1]))
            feats.append(self.encoder.layer3(feats[-1]))
            feats.append(self.encoder.layer4(feats[-1]))
            return feats

    return RefEncoder()


def load_ref_module(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"{REFERENCE}/models/{name}.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def randomize_bn_stats(torch, model, seed):
    """Non-trivial BN running stats so the conversion is exercised."""
    gen = np.random.default_rng(seed)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(torch.tensor(
                gen.normal(0, 0.05, mod.running_mean.shape
                           ).astype(np.float32)))
            mod.running_var.copy_(torch.tensor(
                gen.uniform(0.8, 1.2, mod.running_var.shape
                            ).astype(np.float32)))


# ----------------------------------------------------------- torch eval

def torch_eval_frames(torch, models, frames, cfg, thing_list, stuff_list,
                      ignore_classes, num_classes):
    """Reference eval pipeline over the frame list -> metric dict."""
    from misc.post_processing_panoptic import get_panoptic_segmentation
    import importlib.util

    def load_eval(name):
        spec = importlib.util.spec_from_file_location(
            f"ref_eval_{name}", f"{REFERENCE}/eval/{name}.py")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module

    depth_eval = load_eval("depth").DepthEvaluator(
        use_gt_scale=cfg.eval.depth.use_gt_scale,
        depth_ranges=tuple(cfg.eval.depth.depth_ranges))
    sem_eval = load_eval("semantic").SemanticEvaluator(
        num_classes, ignore_classes=list(ignore_classes))
    pan_eval = load_eval("panoptic").PanopticEvaluator(
        list(stuff_list), list(thing_list))

    encoder, depth_head, semantic_head, instance_head = models
    conf_total = torch.zeros((num_classes, num_classes), dtype=torch.int64)
    abs_rel_sum, n_frames = 0.0, 0
    preds = []

    def fuse(sem, center, offset):
        pan, _, _ = get_panoptic_segmentation(
            sem, center, offset, list(thing_list), label_divisor=1000,
            stuff_area=0, void_label=255, threshold=0.1, nms_kernel=7,
            top_k=200)
        return pan[None] if pan.dim() == 2 else pan

    with torch.no_grad():
        for frame in frames:
            image = torch.tensor(frame["image_chw"])[None]
            feats = encoder(image)
            depth = depth_head(feats)
            sem_probs = semantic_head(feats)
            center, offset, _ = instance_head(feats)

            depth_gt = torch.tensor(frame["depth"])[None]
            stats = depth_eval.compute_depth_metrics(depth_gt, depth)
            abs_rel_sum += float(stats["d_abs_rel"])
            n_frames += 1

            sem_pred = torch.argmax(sem_probs, dim=1).to(torch.uint8)
            sem_gt = torch.tensor(frame["semantic"].astype(np.int64))[None]
            conf_total += sem_eval.compute_confusion_matrix(
                sem_pred, sem_gt).to(torch.int64)

            # GT panoptic from GT maps (adapt_codeps.py:232-239)
            pan_gt = fuse(sem_gt, torch.tensor(
                frame["center"])[None].permute(0, 3, 1, 2),
                torch.tensor(frame["offset"])[None].permute(0, 3, 1, 2))
            pan_pred = fuse(sem_probs, center, offset)
            pan_eval.update(pan_gt, pan_pred.to(torch.int64))
            preds.append({
                "semantic": sem_pred[0].numpy().astype(np.int32),
                "panoptic": pan_pred[0].numpy().astype(np.int32),
                "depth": depth[0, 0].numpy(),
            })

    miou_per_class = sem_eval.compute_sem_miou(conf_total.float())
    keep = [i for i in range(num_classes) if i not in ignore_classes]
    has_gt = conf_total[keep][:, keep].sum(dim=1) > 0
    miou = float(miou_per_class[has_gt].mean()) if bool(has_gt.any()) \
        else 0.0
    scores = pan_eval.evaluate()
    return {
        "abs_rel": abs_rel_sum / max(n_frames, 1),
        "miou": miou,
        "pq": float(scores["All"]["pq"]) * 100.0,
        "sq": float(scores["All"]["sq"]) * 100.0,
        "rq": float(scores["All"]["rq"]) * 100.0,
    }, preds


# ------------------------------------------------------------- jax eval

def jax_eval_frames(cfg, params, batch_stats, frames, thing_list,
                    stuff_list, ignore_classes, num_classes):
    import jax
    import jax.numpy as jnp

    from codeps_tpu.evaluation import PanopticEvaluator, compute_sem_miou
    from codeps_tpu.models import build_modules
    from codeps_tpu.tasks.adapt import make_eval_step, make_gt_panoptic_step

    modules = build_modules(cfg, num_classes, dtype=jnp.float32)
    eval_step = make_eval_step(modules, cfg, thing_list, ignore_classes)
    gt_panoptic = make_gt_panoptic_step(modules, thing_list)
    pan_eval = PanopticEvaluator(list(stuff_list), list(thing_list))

    conf_total = np.zeros((num_classes, num_classes), np.int64)
    abs_rel_sum = 0.0
    preds = []
    for frame in frames:
        batch = {
            "image": jnp.asarray(frame["image_hwc"])[None],
            "semantic": jnp.asarray(frame["semantic"].astype(np.int32))[None],
            "depth_gt": jnp.asarray(frame["depth"])[None],
        }
        results, stats = eval_step(params, batch_stats, batch)
        abs_rel_sum += float(stats["d_abs_rel"])
        conf_total += np.asarray(stats["sem_conf"]).astype(np.int64)
        pan_gt = gt_panoptic(
            batch["semantic"],
            jnp.asarray(frame["center"])[None],
            jnp.asarray(frame["offset"])[None])
        pan_eval.update(np.asarray(pan_gt), np.asarray(results["panoptic"]))
        preds.append({
            "semantic": np.asarray(results["semantic"])[0].astype(np.int32),
            "panoptic": np.asarray(results["panoptic"])[0].astype(np.int32),
            "depth": np.asarray(results["depth"])[0, ..., 0],
        })

    per_class = compute_sem_miou(conf_total, num_classes, ignore_classes)
    keep = [i for i in range(num_classes) if i not in ignore_classes]
    has_gt = conf_total[keep][:, keep].sum(axis=1) > 0
    miou = float(per_class[has_gt].mean()) if has_gt.any() else 0.0
    scores = pan_eval.evaluate()
    return {
        "abs_rel": abs_rel_sum / max(len(frames), 1),
        "miou": miou,
        "pq": float(scores["All"]["pq"]) * 100.0,
        "sq": float(scores["All"]["sq"]) * 100.0,
        "rq": float(scores["All"]["rq"]) * 100.0,
    }, preds


# ----------------------------------------------------------------- main

def run(num_frames=6, feed_size=(64, 96), seed=7, out_md="PARITY_E2E.md",
        tree_root=None, pretrain_steps=0, num_layers=18,
        save_via_reference=False, append=False):
    """``pretrain_steps>0`` briefly overfits the torch reference on the
    synthetic frames (supervised semantic/center/offset/depth) before
    the comparison, so PQ/mIoU compare non-trivial predictions instead
    of random-weight noise (the PQ matching machinery then runs on real
    segment sets; with 0 the pixel-agreement guard carries the test).

    ``num_layers=101`` runs the PRODUCTION backbone (Bottleneck
    ResNet-101, expansion-4 channel plan — the published configs'
    po_depth_net). ``save_via_reference=True`` writes the checkpoint
    through the reference's own ``io_utils.save_checkpoint``
    (io_utils/io_utils.py:76-88: {config, state_dict, training_meta})
    including the pose backbone/head, so ``io/convert_pth.py`` is
    exercised against a reference-save-path production file.
    ``append=True`` appends a section to ``out_md`` instead of
    overwriting."""
    import torch

    from codeps_tpu.config import gen_config
    from codeps_tpu.data import Kitti360
    from codeps_tpu.data.synthetic import make_kitti360_tree
    from codeps_tpu.io import pretrained_from_checkpoints
    from codeps_tpu.models import build_modules, init_params

    torch.manual_seed(seed)

    tmp = tree_root or tempfile.mkdtemp(prefix="parity_e2e_")
    if tree_root is None:
        import atexit
        import shutil
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    root = make_kitti360_tree(Path(tmp) / "k360", num_frames=num_frames,
                              width=feed_size[1] * 2,
                              height=feed_size[0] * 2, seed=seed)

    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = num_layers
    cfg.model.pose_sflow_net.params.nof_layers = 18
    cfg.dataset.name = "kitti_360"
    cfg.dataset.path = str(root)
    cfg.dataset.feed_img_size = list(feed_size)
    cfg.dataset.center_heatmap_sigma = 4
    cfg.freeze()

    dataset = Kitti360("sequence", cfg.dataset, return_depth=True,
                       sequences=["03"], sequence_reference_mode="semantic",
                       label_mode="codeps")
    num_classes = dataset.num_classes
    thing_list = tuple(dataset.thing_classes)
    stuff_list = tuple(dataset.stuff_classes)
    ignore_classes = tuple(dataset.ignore_classes)

    # ---- torch reference model with seeded weights
    encoder = build_torch_encoder(torch, num_layers=num_layers)
    num_ch_enc = np.array([64, 64, 128, 256, 512])
    if num_layers > 34:
        num_ch_enc[1:] *= 4  # Bottleneck expansion (resnet_encoder.py:112)
    depth_head = load_ref_module("depth_head").DepthHead(num_ch_enc,
                                                         use_skips=True)
    semantic_head = load_ref_module("semantic_head").SemanticHead(
        num_ch_enc, num_classes, use_skips=True,
        use_guda_fusion=cfg.model.semantic_head.use_guda_fusion)
    instance_head = load_ref_module("instance_head").InstanceHead(
        num_ch_enc, use_thing_mask=False)
    for model in (encoder, depth_head, semantic_head, instance_head):
        model.eval()
    with torch.no_grad():
        randomize_bn_stats(torch, encoder, seed + 1)
        randomize_bn_stats(torch, instance_head, seed + 2)

    # ---- frames through our loader; identical normalized inputs
    mean = np.asarray(cfg.dataset.normalization.rgb_mean, np.float32)
    std = np.asarray(cfg.dataset.normalization.rgb_std, np.float32)
    frames = []
    for i in range(len(dataset)):
        sample = dataset[i]
        rgb = np.asarray(sample["rgb"][0])
        if rgb.dtype == np.uint8:
            norm = (rgb.astype(np.float32) / 255.0 - mean) / std
        else:
            norm = np.asarray(rgb, np.float32)
        frames.append({
            "image_hwc": norm,
            "image_chw": np.ascontiguousarray(norm.transpose(2, 0, 1)),
            "semantic": np.asarray(sample["semantic"]),
            "depth": np.asarray(sample["depth"], np.float32),
            "center": np.asarray(sample["center"], np.float32),
            "offset": np.asarray(sample["offset"], np.float32),
        })

    if pretrain_steps:
        # Overfit the frame set so predictions carry real structure
        # (PQ matching runs on non-empty segment sets). CE-on-softmax
        # mirrors the reference head-output quirk.
        import torch.nn.functional as F
        for model in (encoder, depth_head, semantic_head, instance_head):
            model.train()
        opt = torch.optim.Adam(
            [p for m in (encoder, depth_head, semantic_head,
                         instance_head) for p in m.parameters()],
            lr=1e-3)
        images = torch.tensor(np.stack(
            [f["image_chw"] for f in frames]))
        sem_gt = torch.tensor(np.stack(
            [f["semantic"] for f in frames]).astype(np.int64))
        center_gt = torch.tensor(np.stack(
            [f["center"] for f in frames])).permute(0, 3, 1, 2)
        offset_gt = torch.tensor(np.stack(
            [f["offset"] for f in frames])).permute(0, 3, 1, 2)
        depth_gt = torch.tensor(np.stack(
            [f["depth"] for f in frames]))[:, None]
        valid = depth_gt > 0
        for _ in range(pretrain_steps):
            opt.zero_grad()
            feats = encoder(images)
            sem = semantic_head(feats)
            center, offset, _ = instance_head(feats)
            depth = depth_head(feats)
            loss = (F.cross_entropy(sem, sem_gt, ignore_index=255)
                    + 200.0 * F.mse_loss(center, center_gt)
                    + 0.05 * F.l1_loss(offset, offset_gt)
                    + 0.2 * torch.mean(torch.abs(
                        torch.log(depth[valid])
                        - torch.log(depth_gt[valid]))))
            loss.backward()
            opt.step()
        for model in (encoder, depth_head, semantic_head, instance_head):
            model.eval()

    ckpt_path = Path(tmp) / "parity_weights.pth"
    state_dict = {
        "backbone_po_depth": encoder.state_dict(),
        "depth_head": depth_head.state_dict(),
        "semantic_head": semantic_head.state_dict(),
        "instance_head": instance_head.state_dict(),
    }
    if save_via_reference:
        # Write through the reference's OWN save path
        # (io_utils/io_utils.py:76-88: torch.save of {config: yaml,
        # state_dict, training_meta}) with the full production module
        # set including the pose trunk/head, so the converter ingests a
        # file byte-layout-identical to what reference training writes.
        import importlib.util as ilu
        pa_spec = ilu.spec_from_file_location(
            "parity_adapt_for_stubs",
            str(Path(__file__).resolve().parent / "parity_adapt.py"))
        pa_mod = ilu.module_from_spec(pa_spec)
        pa_spec.loader.exec_module(pa_mod)
        pa_mod.install_reference_stubs()
        spec = ilu.spec_from_file_location(
            "ref_io_utils", f"{REFERENCE}/io_utils/io_utils.py")
        ref_io = ilu.module_from_spec(spec)
        spec.loader.exec_module(ref_io)
        pose_encoder = build_torch_encoder(torch, in_channels=6)
        pose_head = load_ref_module("pose_head").PoseHead(
            np.array([64, 64, 128, 256, 512]), num_input_features=1,
            num_frames_to_predict_for=2)
        randomize_bn_stats(torch, pose_encoder, seed + 3)
        state_dict["backbone_pose_sflow"] = pose_encoder.state_dict()
        state_dict["pose_head"] = pose_head.state_dict()

        class _DumpableCfg:  # stands in for the yacs node's .dump()
            @staticmethod
            def dump():
                return "parity_e2e reference-save-path fixture\n"

        ref_io.save_checkpoint(str(ckpt_path), _DumpableCfg(), epoch=3,
                               global_step=1234,
                               model_state_dict=state_dict)
        saved = torch.load(str(ckpt_path), map_location="cpu")
        assert set(saved) == {"config", "state_dict", "training_meta"}, (
            "reference save layout changed")
    else:
        torch.save({"state_dict": state_dict}, str(ckpt_path))

    torch_metrics, torch_preds = torch_eval_frames(
        torch, (encoder, depth_head, semantic_head, instance_head), frames,
        cfg, thing_list, stuff_list, ignore_classes, num_classes)

    # ---- convert + jax eval
    import jax
    import jax.numpy as jnp
    modules = build_modules(cfg, num_classes, dtype=jnp.float32)
    params, batch_stats = init_params(jax.random.PRNGKey(0), modules,
                                      feed_size)
    params, batch_stats = pretrained_from_checkpoints(
        [str(ckpt_path)], params, batch_stats, cfg)
    jax_metrics, jax_preds = jax_eval_frames(cfg, params, batch_stats,
                                             frames, thing_list, stuff_list,
                                             ignore_classes, num_classes)

    # Direct prediction agreement (stronger than metric deltas when the
    # random-weight PQ is trivially 0 on both sides): identical weights
    # must yield identical label maps up to f32 argmax ties.
    sem_agree, pan_agree, depth_rel = [], [], []
    for tp, jp in zip(torch_preds, jax_preds):
        sem_agree.append(float(np.mean(tp["semantic"] == jp["semantic"])))
        pan_agree.append(float(np.mean(tp["panoptic"] == jp["panoptic"])))
        depth_rel.append(float(np.max(
            np.abs(tp["depth"] - jp["depth"])
            / np.maximum(np.abs(tp["depth"]), 1e-6))))
    agreement = {
        "sem_pixel_agreement": float(np.mean(sem_agree)),
        "pan_pixel_agreement": float(np.mean(pan_agree)),
        "depth_max_rel_diff": float(np.max(depth_rel)),
    }

    deltas = {key: abs(torch_metrics[key] - jax_metrics[key])
              for key in torch_metrics}
    ok = (deltas["pq"] <= PQ_TOL and deltas["abs_rel"] <= ABS_REL_TOL
          and deltas["miou"] <= MIOU_TOL
          and agreement["sem_pixel_agreement"] >= 0.995
          and agreement["pan_pixel_agreement"] >= 0.995
          and agreement["depth_max_rel_diff"] <= 0.005)

    title = ("# PARITY_E2E — end-to-end metric parity vs the PyTorch "
             "reference" if not append else
             f"## Model-scale round-trip: ResNet-{num_layers}"
             + (", reference-save-path checkpoint"
                if save_via_reference else ""))
    lines = [
        title,
        "",
        f"Same {'synthetically pretrained (' + str(pretrain_steps) + ' torch steps)' if pretrain_steps else 'seeded'} "
        f"ResNet-{num_layers} weights (converted with "
        "`io/convert_pth.py`"
        + (" from a checkpoint written by the reference's own "
           "`io_utils.save_checkpoint`, io_utils/io_utils.py:76-88, "
           "incl. pose trunk + head" if save_via_reference else "")
        + f"), same {len(frames)} synthetic KITTI-360 frames at "
        f"{feed_size[0]}x{feed_size[1]}, both eval pipelines end-to-end "
        "(encoder -> heads -> panoptic fusion -> evaluators). "
        "Reference side: the reference's own head modules, panoptic "
        "post-processing, and evaluators (torch CPU). Our side: "
        "`tasks/adapt.make_eval_step` (XLA CPU, f32).",
        "",
        "| Metric | torch reference | codeps_tpu | abs delta | tolerance "
        "| pass |",
        "|---|---|---|---|---|---|",
    ]
    tols = {"abs_rel": ABS_REL_TOL, "miou": MIOU_TOL, "pq": PQ_TOL,
            "sq": PQ_TOL, "rq": PQ_TOL}
    for key in ("pq", "sq", "rq", "miou", "abs_rel"):
        tol = tols[key]
        passed = deltas[key] <= tol
        lines.append(
            f"| {key} | {torch_metrics[key]:.6f} | {jax_metrics[key]:.6f} "
            f"| {deltas[key]:.6f} | {tol} | {'yes' if passed else 'NO'} |")
    lines += [
        "",
        "Direct prediction agreement (same weights -> same label maps; "
        "guards against trivially-equal metrics like PQ=0==0):",
        "",
        "| Check | value | threshold | pass |",
        "|---|---|---|---|",
        f"| semantic pixel agreement | "
        f"{agreement['sem_pixel_agreement']:.6f} | >= 0.995 | "
        f"{'yes' if agreement['sem_pixel_agreement'] >= 0.995 else 'NO'} |",
        f"| panoptic pixel agreement | "
        f"{agreement['pan_pixel_agreement']:.6f} | >= 0.995 | "
        f"{'yes' if agreement['pan_pixel_agreement'] >= 0.995 else 'NO'} |",
        f"| depth max relative diff | "
        f"{agreement['depth_max_rel_diff']:.6f} | <= 0.005 | "
        f"{'yes' if agreement['depth_max_rel_diff'] <= 0.005 else 'NO'} |",
        "",
        "Tolerances: BASELINE.md operative bars (PQ within 0.5, abs_rel "
        "within 0.005; SQ/RQ held to the PQ bar, mIoU to 0.005).",
        "",
        f"Verdict: {'PASS' if ok else 'FAIL'}",
        "",
        "Reproduce: `python scripts/parity_e2e.py"
        + (" --r101" if append else "") + "`",
    ]
    text = "\n".join(lines) + "\n"
    if append and Path(out_md).exists():
        prev = Path(out_md).read_text()
        marker = lines[0]
        if marker in prev:  # idempotent re-runs replace the section
            prev = prev[:prev.index(marker)].rstrip() + "\n"
        Path(out_md).write_text(prev + "\n" + text)
    else:
        Path(out_md).write_text(text)
    print("\n".join(lines))
    return ok, torch_metrics, jax_metrics, deltas


if __name__ == "__main__":
    # The artifact run pretrains the torch reference on the synthetic
    # frames so PQ/mIoU compare non-trivial predictions (VERDICT r2
    # weak #4); the CI wrapper keeps pretrain_steps=0 for speed.
    if "--r101" in sys.argv:
        # Model-scale round-trip (VERDICT r4 #5): production Bottleneck
        # ResNet-101 + all heads, checkpoint written by the reference's
        # own save path, converted, compared end-to-end. Appends a
        # section to PARITY_E2E.md. Resolution via PARITY_E2E_R101_SIZE
        # ("HxW", default 128x256 — the largest this 1-core host
        # compiles in reasonable time; /32-divisible like production).
        size = os.environ.get("PARITY_E2E_R101_SIZE", "128x256")
        h, w = (int(v) for v in size.split("x"))
        ok, *_ = run(num_frames=3, feed_size=(h, w), num_layers=101,
                     save_via_reference=True, append=True,
                     pretrain_steps=int(
                         os.environ.get("PARITY_E2E_PRETRAIN", "0")))
        sys.exit(0 if ok else 1)
    steps = int(os.environ.get("PARITY_E2E_PRETRAIN", "300"))
    ok, *_ = run(pretrain_steps=steps)
    sys.exit(0 if ok else 1)
