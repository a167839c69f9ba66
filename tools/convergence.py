"""On-chip convergence run: prove the compiled train step + real input
pipeline learns optical flow (VERDICT round-1 item #1).

Trains MaskFlownet_S from scratch on the synthetic learnable-flow
curriculum (``maskflownet_tpu.data.synthetic``: textured pairs, exact
affine flow labels) through the PRODUCTION input path -- ``TrainLoader``
(shuffle/crop/flip threads) -> host geometric augmentation ->
``DevicePrefetcher`` -> the single jitted train step (device color aug +
forward + multiscale loss + grad + Adam) -- and records a step-vs-EPE curve
on held-out pairs into a JSON artifact.

Run (real chip):
    python tools/convergence.py --steps 4000 --out CONVERGENCE_r02.json

The CPU-mesh twin lives in tests/test_convergence.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--target", type=str, default="320,448")
    p.add_argument("--orig", type=str, default="384,512")
    p.add_argument("--train_pairs", type=int, default=192)
    p.add_argument("--val_pairs", type=int, default=24)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--bound", type=float, default=0.5,
                   help="final-EPE pass bound in pixels")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--out", type=str, default="CONVERGENCE.json")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--input", type=str, default="cache",
                   choices=("cache", "prefetch"),
                   help="'cache': HBM-resident batches with background host "
                        "refresh (DeviceBatchCache -- the production path "
                        "when the chip sits behind a network tunnel; echo "
                        "factor is recorded). 'prefetch': double-buffered "
                        "host->device transfer of every batch.")
    p.add_argument("--model", type=str, default="MaskFlownet_S",
                   choices=("MaskFlownet_S", "MaskFlownet"))
    p.add_argument("--load_head", type=str, default=None,
                   help="bootstrap the cascade head from a MaskFlownet_S "
                        "checkpoint (reference main.py:129-139 flow); "
                        "implies --fix_head unless --no_fix_head")
    p.add_argument("--no_fix_head", action="store_true")
    p.add_argument("--q", type=float, default=None,
                   help="robust-loss exponent (cascade stages use 0.4)")
    p.add_argument("--save", type=str, default=None,
                   help="checkpoint prefix to save params+opt state to "
                        "at the end of the run (Trainer.save)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from maskflownet_tpu.augment.host_geometry import batch_host_geometry
    from maskflownet_tpu.config import presets
    from maskflownet_tpu.data import DeviceBatchCache, Dataset, TrainLoader
    from maskflownet_tpu.data.synthetic import make_dataset
    from maskflownet_tpu.models import ModelConfig
    from maskflownet_tpu.parallel import DevicePrefetcher
    from maskflownet_tpu.training import Trainer, TrainSettings

    th, tw = (int(s) for s in args.target.split(","))
    oh, ow = (int(s) for s in args.orig.split(","))

    print(f"generating {args.train_pairs}+{args.val_pairs} pairs "
          f"at {oh}x{ow}...", flush=True)
    t0 = time.time()
    tr_cols = make_dataset(np.random.RandomState(0), args.train_pairs, oh, ow)
    v1, v2, vf, vv = make_dataset(np.random.RandomState(10**6),
                                  args.val_pairs, th, tw)
    print(f"generated in {time.time() - t0:.0f}s", flush=True)

    fix_head = bool(args.load_head) and not args.no_fix_head
    settings = TrainSettings(
        model=args.model, model_cfg=ModelConfig(), q=args.q,
        fix_head=fix_head,
        compute_dtype=args.compute_dtype, target_shape=(th, tw),
        orig_shape=(oh, ow), geo=None,
        color=presets.color_aug_config("chairs"))
    trainer = Trainer(settings)
    if args.load_head:
        trainer.load_head(args.load_head)
        print(f"loaded head from {args.load_head} (fix_head={fix_head})",
              flush=True)

    loader = TrainLoader([Dataset(tr_cols)] * args.batch, args.batch,
                         (oh, ow), seed=1)
    geo_cfg = presets.geometry_aug_config("chairs", (th, tw), (oh, ow))
    aug_rng = np.random.RandomState(1234)

    def host_aug(batch):
        img1, img2, flow, mask = batch
        i1, i2, fl, mk = batch_host_geometry(
            aug_rng, img1.astype(np.float32), img2.astype(np.float32),
            flow.astype(np.float32), mask.astype(np.float32) / 255.0,
            geo_cfg)
        return (np.clip(i1 + 0.5, 0, 255).astype(np.uint8),
                np.clip(i2 + 0.5, 0, 255).astype(np.uint8),
                fl.astype(np.float16),
                np.clip(mk * 255 + 0.5, 0, 255).astype(np.uint8))

    if args.input == "cache":
        prefetch = DeviceBatchCache(lambda: host_aug(loader.get()),
                                    trainer.mesh, slots=8)
    else:
        prefetch = DevicePrefetcher(loader.get, trainer.mesh, depth=2,
                                    transform=host_aug)

    def evaluate():
        return trainer.validate(v1, v2, vf, vv, batch_size=args.batch)

    curve = []

    def checkpoint_curve():
        # incremental artifact: survive timeouts/kills with a usable curve
        with open(args.out + ".partial", "w") as fp:
            json.dump({"curve": curve}, fp)

    epe0 = evaluate()
    curve.append([0, round(float(epe0), 4)])
    checkpoint_curve()
    print(f"step 0: epe {epe0:.3f}", flush=True)

    t_train0 = time.time()
    t_spent_eval = 0.0
    for step in range(1, args.steps + 1):
        m = trainer.train_batch_device(prefetch.get(), lr=args.lr)
        if step % args.eval_every == 0 or step == args.steps:
            te = time.time()
            epe = evaluate()
            t_spent_eval += time.time() - te
            curve.append([step, round(float(epe), 4)])
            checkpoint_curve()
            print(f"step {step}: epe {epe:.3f} loss {float(m['loss']):.4f} "
                  f"({time.time() - t_train0:.0f}s)", flush=True)
    prefetch.stop()
    if args.save:
        trainer.save(args.save)
        print(f"saved checkpoint to {args.save}.npz", flush=True)

    train_s = time.time() - t_train0 - t_spent_eval
    sps = args.steps * args.batch / train_s
    final = curve[-1][1]
    out = {
        "task": "synthetic_affine_flow",
        "model": args.model,
        "fix_head": fix_head,
        "q": args.q,
        "device": str(jax.devices()[0].device_kind),
        "steps": args.steps,
        "batch": args.batch,
        "target_shape": [th, tw],
        "train_pairs": args.train_pairs,
        "val_pairs": args.val_pairs,
        "lr": args.lr,
        "input_path": ("TrainLoader+host_geo_aug+"
                       + ("DeviceBatchCache" if args.input == "cache"
                          else "DevicePrefetcher")
                       + "+device_color_aug"),
        "echo_factor": round(getattr(prefetch, "echo_factor", 0.0), 2),
        "curve": curve,
        "epe0": curve[0][1],
        "final_epe": final,
        "bound_px": args.bound,
        "passed": bool(final < args.bound),
        "train_samples_per_s": round(sps, 1),
    }
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("final_epe", "epe0", "passed", "train_samples_per_s")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
