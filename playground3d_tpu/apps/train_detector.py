"""Detector training CLI (reference train_detector_3D_angle.py /
train_crop_detector.py / pytorch_retinanet_detector_directional/train.py).

Trains the directional RetinaNet (full-frame mode) or the crop detector
(--crop: object-centered square crops, the reference's CROP=112 localizer)
on the synthetic dataset or cached .npz shards, with data-parallel sharding
over all available devices, plateau LR schedule and per-epoch npz
checkpoints.

Usage:
    python -m playground3d_tpu.apps.train_detector --steps 500 --batch 8 \
        --height 512 --width 768 --out detector.npz
    python -m playground3d_tpu.apps.train_detector --crop --crop-size 112 ...
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--zoom", type=float, default=1.5)
    ap.add_argument("--crop", action="store_true", help="train the crop detector")
    ap.add_argument("--crop-size", type=int, default=112)
    ap.add_argument("--shards", nargs="*", default=None, help="cached .npz shards")
    ap.add_argument("--out", default="detector.npz")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    ap.add_argument("--stem", default="conv7", choices=["conv7", "s2d"])
    ap.add_argument("--feature-size", type=int, default=256)
    ap.add_argument("--tower-depth", type=int, default=4)
    ap.add_argument("--shared-tower", action="store_true")
    ap.add_argument(
        "--f32-wire", action="store_true",
        help="ship normalized f32 frames instead of uint8 (4x the transfer)",
    )
    args = ap.parse_args(argv)

    import jax

    from playground3d_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from playground3d_tpu.data.dataset import (
        CachedDetectionDataset,
        Prefetcher,
        SyntheticDetectionDataset,
    )
    from playground3d_tpu.parallel.mesh import make_mesh
    from playground3d_tpu.train.trainer import TrainConfig, Trainer

    shape = (args.crop_size, args.crop_size) if args.crop else (args.height, args.width)
    cfg = TrainConfig(
        depth=args.depth, image_shape=shape, lr=args.lr, stem=args.stem,
        feature_size=args.feature_size, tower_depth=args.tower_depth,
        shared_tower=args.shared_tower,
    )
    mesh = make_mesh() if args.dp else None
    trainer = Trainer(cfg, key=jax.random.PRNGKey(0), mesh=mesh)
    if args.resume:
        trainer.load(args.resume)

    if args.shards:
        ds = CachedDetectionDataset(args.shards)
    else:
        ds = SyntheticDetectionDataset(
            image_shape=(args.height, args.width),
            crop_mode=args.crop,
            crop_size=args.crop_size,
            zoom=args.zoom,
            # uint8 over the wire; forward_raw normalizes on device — 4x less
            # host->device transfer than normalized f32 (tunnel-bound hosts)
            output_dtype="float32" if args.f32_wire else "uint8",
        )
    batches = Prefetcher(ds.batches(args.batch), depth=3, device_put=mesh is None)

    start = time.time()
    epoch_losses = []
    for step, (frames, labels) in zip(range(args.steps), batches):
        m = trainer.train_step(frames, labels)
        # keep the loss as a device scalar: float()-ing it every step forces a
        # host sync that serializes H2D transfer with compute on slow links
        epoch_losses.append(m["loss"])
        if step % 10 == 0:
            loss = float(m["loss"])
            rate = (step + 1) / (time.time() - start)
            print(
                f"\rstep {step}: loss={loss:.4f} cls={float(m['cls']):.4f} "
                f"reg={float(m['reg']):.4f} vp={float(m['vp']):.4f} "
                f"({rate:.2f} it/s)",
                end="", flush=True,
            )
        if (step + 1) % args.steps_per_epoch == 0:
            import numpy as np

            # ONE batched device->host fetch for the whole epoch's losses —
            # per-item float() would pay one tunnel round trip per step
            trainer.end_epoch(float(np.mean(jax.device_get(epoch_losses))))
            epoch_losses = []
            trainer.save(args.out)
            print(f"\nepoch checkpoint -> {args.out} (lr={trainer.lr:.2e})")

    trainer.save(args.out)
    print(f"\ndone; final checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
