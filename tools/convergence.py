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
    p.add_argument("--lr_schedule", type=str, default="piecewise",
                   choices=("constant", "piecewise"),
                   help="'piecewise' (default) steps the LR down /2, /4, /8 "
                        "at 50%%/70%%/85%% of the run (reference-style "
                        "boundary schedule, pipeline.py:65-75) so the "
                        "convergence tail is monotone instead of bouncing "
                        "at a constant LR (VERDICT r3 W4)")
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--bound", type=float, default=None,
                   help="final-EPE pass bound in pixels (default: 0.5 for "
                        "the affine task, 3.0 for the occlusion task — "
                        "occluded pixels carry full supervision but no "
                        "visible correspondence, so the attainable EPE "
                        "floor is higher)")
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
    p.add_argument("--task", type=str, default="affine",
                   choices=("affine", "occlusion"),
                   help="'affine': global-affine pairs (round-2 curriculum)."
                        " 'occlusion': pairs with independently-moving "
                        "foreground objects -- real occlusion GT + large "
                        "displacements; trains WITHOUT occlusion supervision"
                        " and reports occlusion-AUC of the learned mask "
                        "(the paper's core claim, MaskFlownet.py:230-233)")
    p.add_argument("--aug", type=str, default=None,
                   choices=("host", "device"),
                   help="geometry-augmentation placement; 'device' runs "
                        "crop+affine inside the jitted step (echoed cached "
                        "batches then get fresh geometry every step). "
                        "Default: 'device' when --input cache (echoed "
                        "batches must not repeat identical geometry -- the "
                        "CLI applies the same auto rule), else 'host'.")
    p.add_argument("--echo", type=int, default=None,
                   help="CONTROLLED data echoing (VERDICT r4 #5): fetch a "
                        "fresh wire batch every N steps and re-train on the "
                        "resident batch in between (geometry+color stay "
                        "fresh per step via the folded PRNG key -- requires "
                        "--aug device). N=1 is the pure no-reuse path. "
                        "Unlike --input cache, whose echo factor floats "
                        "with the wire speed, this pins it exactly, so "
                        "echo-1/8/64 runs are comparable.")
    p.add_argument("--viz", type=str, default=None,
                   help="write a mask-visualization PNG (img1 | GT occ | "
                        "learned mask) for the first validation pairs")
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

    if args.bound is None:
        args.bound = 3.0 if args.task == "occlusion" else 0.5
    if args.aug is None:
        # mirror the CLI auto rule: device-cached batches are echoed, so
        # geometry must be drawn fresh inside the compiled step -- pairing
        # cache with host aug silently repeats identical crops/affines
        args.aug = "device" if args.input == "cache" else "host"
    elif args.aug == "host" and args.input == "cache":
        import warnings
        warnings.warn(
            "--input cache with --aug host trains on echoed batches with "
            "REPEATED geometry (identical crops/affines each echo); use "
            "--aug device or --input prefetch", stacklevel=1)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from maskflownet_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from maskflownet_tpu.augment.host_geometry import batch_host_geometry
    from maskflownet_tpu.config import presets
    from maskflownet_tpu.data import DeviceBatchCache, Dataset, TrainLoader
    from maskflownet_tpu.data.synthetic import (make_dataset,
                                                make_occluded_dataset)
    from maskflownet_tpu.models import ModelConfig
    from maskflownet_tpu.parallel import DevicePrefetcher
    from maskflownet_tpu.training import Trainer, TrainSettings

    th, tw = (int(s) for s in args.target.split(","))
    oh, ow = (int(s) for s in args.orig.split(","))

    print(f"generating {args.train_pairs}+{args.val_pairs} {args.task} pairs "
          f"at {oh}x{ow}...", flush=True)
    t0 = time.time()
    v_occ = None
    if args.task == "occlusion":
        tr_cols = make_occluded_dataset(np.random.RandomState(0),
                                        args.train_pairs, oh, ow)[:4]
        v1, v2, vf, vv, v_occ = make_occluded_dataset(
            np.random.RandomState(10**6), args.val_pairs, th, tw)
    else:
        tr_cols = make_dataset(np.random.RandomState(0), args.train_pairs,
                               oh, ow)
        v1, v2, vf, vv = make_dataset(np.random.RandomState(10**6),
                                      args.val_pairs, th, tw)
    print(f"generated in {time.time() - t0:.0f}s", flush=True)

    geo_cfg = presets.geometry_aug_config("chairs", (th, tw), (oh, ow))
    fix_head = bool(args.load_head) and not args.no_fix_head
    settings = TrainSettings(
        model=args.model, model_cfg=ModelConfig(), q=args.q,
        fix_head=fix_head,
        compute_dtype=args.compute_dtype, target_shape=(th, tw),
        orig_shape=(oh, ow),
        geo=geo_cfg if args.aug == "device" else None,
        color=presets.color_aug_config("chairs"))
    trainer = Trainer(settings)
    if args.load_head:
        trainer.load_head(args.load_head)
        print(f"loaded head from {args.load_head} (fix_head={fix_head})",
              flush=True)

    loader = TrainLoader([Dataset(tr_cols)] * args.batch, args.batch,
                         (oh, ow), seed=1)
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

    def raw(batch):          # device aug: ship raw orig-shape batches
        img1, img2, flow, mask = batch
        return (img1, img2, flow.astype(np.float16), mask)

    transform = raw if args.aug == "device" else host_aug
    if args.echo:
        if args.aug != "device":
            raise SystemExit("--echo requires --aug device (an echoed batch "
                             "must redraw geometry inside the step)")
        # controlled echo rides the plain double-buffered prefetcher; the
        # loop below re-uses each fetched device batch exactly N times
        prefetch = DevicePrefetcher(loader.get, trainer.mesh, depth=2,
                                    transform=transform)
    elif args.input == "cache":
        prefetch = DeviceBatchCache(lambda: transform(loader.get()),
                                    trainer.mesh, slots=8)
    else:
        prefetch = DevicePrefetcher(loader.get, trainer.mesh, depth=2,
                                    transform=transform)

    def occlusion_auc():
        """AUC of (1 - learned mask) as a classifier for GT occlusion,
        pooled over the validation set's in-frame pixels."""
        pos, neg = [], []
        b = args.batch
        for j in range(0, len(v1), b):
            i1 = np.stack(v1[j:j + b]).astype(np.float32) / 255.0
            i2 = np.stack(v2[j:j + b]).astype(np.float32) / 255.0
            k = i1.shape[0]
            if k < b:
                pad = b - k
                i1 = np.concatenate([i1, np.repeat(i1[-1:], pad, 0)])
                i2 = np.concatenate([i2, np.repeat(i2[-1:], pad, 0)])
            _, occ_pred, _ = trainer.do_batch(i1, i2)
            for t in range(k):
                score = 1.0 - occ_pred[t, ..., 0]
                gt = v_occ[j + t][..., 0] > 0
                va = vv[j + t][..., 0] > 0
                pos.append(score[gt & va])
                neg.append(score[~gt & va])
        pos = np.concatenate(pos)
        neg = np.sort(np.concatenate(neg))
        if len(pos) == 0 or len(neg) == 0:
            return float("nan")
        lo = np.searchsorted(neg, pos, side="left")
        hi = np.searchsorted(neg, pos, side="right")
        return float((lo + 0.5 * (hi - lo)).sum() / (len(pos) * len(neg)))

    def evaluate():
        return trainer.validate(v1, v2, vf, vv, batch_size=args.batch)

    curve = []
    auc_curve = []

    def checkpoint_curve():
        # incremental artifact: survive timeouts/kills with a usable curve
        with open(args.out + ".partial", "w") as fp:
            json.dump({"curve": curve, "auc_curve": auc_curve}, fp)

    # The cascade's second ``do_batch`` output is flow2 channel 0 standing in
    # for a mask (reference parity, MaskFlownet.py:543-545) -- an AUC against
    # occlusion GT would be a meaningless ~0.5, so only the S model (whose
    # occ output IS the learned sigmoid mask) reports it (VERDICT r3 W4).
    report_auc = v_occ is not None and args.model == "MaskFlownet_S"

    def eval_point(step):
        epe = evaluate()
        curve.append([step, round(float(epe), 4)])
        msg = f"step {step}: epe {epe:.3f}"
        if report_auc:
            auc = occlusion_auc()
            auc_curve.append([step, round(auc, 4)])
            msg += f" occ_auc {auc:.3f}"
        checkpoint_curve()
        return msg

    print(eval_point(0), flush=True)

    def lr_for(step):
        if args.lr_schedule == "constant":
            return args.lr
        # reference-style boundary schedule (pipeline.py:65-75), scaled to
        # the run length; the final /8 leg keeps the curve tail from
        # bouncing at a too-hot constant LR (VERDICT r3 W4 / r4 re-check)
        frac = step / args.steps
        for bound, div in ((0.5, 1), (0.7, 2), (0.85, 4)):
            if frac <= bound:
                return args.lr / div
        return args.lr / 8

    t_train0 = time.time()
    t_spent_eval = 0.0
    resident = None
    for step in range(1, args.steps + 1):
        if args.echo:
            if resident is None or (step - 1) % args.echo == 0:
                resident = prefetch.get()
            batch = resident
        else:
            batch = prefetch.get()
        m = trainer.train_batch_device(batch, lr=lr_for(step))
        if step % args.eval_every == 0 or step == args.steps:
            te = time.time()
            msg = eval_point(step)
            t_spent_eval += time.time() - te
            print(f"{msg} loss {float(m['loss']):.4f} "
                  f"({time.time() - t_train0:.0f}s)", flush=True)
    prefetch.stop()

    if args.viz and report_auc:
        import cv2
        rows = []
        for t in range(min(3, len(v1))):
            i1 = np.stack([v1[t]]).astype(np.float32) / 255.0
            i2 = np.stack([v2[t]]).astype(np.float32) / 255.0
            _, occ_pred, _ = trainer.do_batch(
                np.repeat(i1, args.batch, 0), np.repeat(i2, args.batch, 0))
            learned = 1.0 - occ_pred[0, ..., 0]   # 1 = predicted occluded
            gt = (v_occ[t][..., 0] > 0).astype(np.float32)
            panel = np.concatenate([
                v1[t][..., ::-1].astype(np.uint8),                # BGR for cv2
                np.repeat((gt * 255).astype(np.uint8)[..., None], 3, -1),
                np.repeat((np.clip(learned, 0, 1) * 255
                           ).astype(np.uint8)[..., None], 3, -1)], axis=1)
            rows.append(panel)
        cv2.imwrite(args.viz, np.concatenate(rows, axis=0))
        print(f"mask visualization -> {args.viz}", flush=True)
    if args.save:
        trainer.save(args.save)
        print(f"saved checkpoint to {args.save}.npz", flush=True)

    head_epe = None
    if args.load_head:
        # head-vs-cascade on the IDENTICAL validation set: how much did the
        # second stage buy over the standalone head it was seeded from?
        head_settings = TrainSettings(
            model="MaskFlownet_S", model_cfg=ModelConfig(),
            compute_dtype=args.compute_dtype, target_shape=(th, tw),
            orig_shape=(oh, ow), geo=None, color=None)
        head_trainer = Trainer(head_settings)
        head_trainer.load(args.load_head, load_states=False)
        head_epe = float(head_trainer.validate(v1, v2, vf, vv,
                                               batch_size=args.batch))
        print(f"head-only epe on the same val set: {head_epe:.3f} "
              f"(cascade: {curve[-1][1]:.3f})", flush=True)

    train_s = time.time() - t_train0 - t_spent_eval
    sps = args.steps * args.batch / train_s
    final = curve[-1][1]
    out = {
        "task": ("synthetic_occluded_flow" if args.task == "occlusion"
                 else "synthetic_affine_flow"),
        "aug_placement": args.aug,
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
        "lr_schedule": args.lr_schedule,
        "input_path": ("TrainLoader+DevicePrefetcher+controlled_echo"
                       if args.echo else
                       "TrainLoader+host_geo_aug+"
                       + ("DeviceBatchCache" if args.input == "cache"
                          else "DevicePrefetcher")
                       + "+device_color_aug"),
        "echo_controlled": args.echo,
        "echo_factor": (float(args.echo) if args.echo else
                        round(getattr(prefetch, "echo_factor", 0.0), 2)),
        "curve": curve,
        "epe0": curve[0][1],
        "final_epe": final,
        "bound_px": args.bound,
        "passed": bool(final < args.bound),
        "train_samples_per_s": round(sps, 1),
    }
    if auc_curve:
        out["auc_curve"] = auc_curve
        out["occ_auc0"] = auc_curve[0][1]
        out["final_occ_auc"] = auc_curve[-1][1]
    elif v_occ is not None:
        out["occ_auc"] = ("skipped: cascade visuals[0] is flow2 ch0, not a "
                          "mask (MaskFlownet.py:543-545)")
    if head_epe is not None:
        out["head_epe_same_valset"] = round(head_epe, 4)
        out["cascade_minus_head_epe"] = round(final - head_epe, 4)
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("final_epe", "epe0", "passed", "train_samples_per_s")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
