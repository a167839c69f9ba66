"""Merge the controlled data-echoing ablation runs (tools/echo_ablation.sh)
into one CONVERGENCE_r05 artifact (VERDICT r4 task #5).

The three runs share EVERYTHING except the pinned echo factor -- task
(synthetic occluded flow), dataset seed, loader seed, augmentation RNG, LR
schedule, step budget -- so any difference in EPE / occlusion-AUC at the
same step is attributable to batch reuse alone. Runs are compared at the
largest step every run reached (a run may be truncated -- pass its
``.partial`` curve via ``--partial``). ``within_noise`` compares the
cross-run spread at the comparison step against the run-internal
variation (max - min over each run's last 4 evaluation points at or
before that step): echoing is benign iff the cross-run spread does not
exceed the within-run noise floor.

    python tools/merge_echo_ablation.py /tmp/CONV_echo8.json \
        /tmp/CONV_echo64.json --partial /tmp/CONV_echo1.json.partial:1 \
        --out CONVERGENCE_r05.json
"""

import argparse
import json


def tail_stats(curve, at_step, k=4):
    """(value at at_step, max-min over the last k points <= at_step)."""
    pts = [p for p in curve if p[0] <= at_step]
    assert pts and pts[-1][0] == at_step, (pts[-1] if pts else None, at_step)
    tail = [v for _, v in pts[-k:]]
    return pts[-1][1], max(tail) - min(tail)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--partial", action="append", default=[],
                   metavar="PATH:ECHO",
                   help="include a truncated run's .partial curve file "
                        "(curve/auc_curve only), tagging its echo factor")
    p.add_argument("--out", default="CONVERGENCE_r05.json")
    args = p.parse_args(argv)

    rows = []
    for path in args.runs:
        with open(path) as fp:
            d = json.load(fp)
        assert d.get("echo_controlled"), f"{path}: not a controlled-echo run"
        d["truncated"] = False
        rows.append(d)

    base = rows[0]
    for d in rows[1:]:  # the control variables really are identical
        for k in ("task", "steps", "batch", "target_shape", "lr",
                  "lr_schedule", "q", "train_pairs", "val_pairs"):
            assert d[k] == base[k], (k, d[k], base[k])

    for spec in args.partial:
        path, _, echo = spec.rpartition(":")
        with open(path) as fp:
            d = json.load(fp)
        rows.append({"echo_controlled": int(echo), "curve": d["curve"],
                     "auc_curve": d.get("auc_curve"), "truncated": True,
                     "train_samples_per_s": None})
    rows.sort(key=lambda d: d["echo_controlled"])

    compare_step = min(d["curve"][-1][0] for d in rows)
    epes, aucs, epe_noises, auc_noises = [], [], [], []
    for d in rows:
        e, en = tail_stats(d["curve"], compare_step)
        epes.append(e)
        epe_noises.append(en)
        if d.get("auc_curve"):
            a, an = tail_stats(d["auc_curve"], compare_step)
            aucs.append(a)
            auc_noises.append(an)
    epe_spread = max(epes) - min(epes)
    auc_spread = (max(aucs) - min(aucs)) if len(aucs) == len(rows) else None

    out = {
        "experiment": "controlled_data_echoing_ablation",
        "claim_under_test": (
            "re-training on an HBM-resident batch (with fresh per-step "
            "device geometry+color augmentation) is benign vs fetching a "
            "fresh wire batch every step -- the assumption behind the "
            "DeviceBatchCache headline throughput (VERDICT r4 W3)"),
        "shared_protocol": {k: base[k] for k in (
            "task", "model", "steps", "batch", "target_shape", "lr",
            "lr_schedule", "q", "train_pairs", "val_pairs", "device",
            "aug_placement")},
        "compare_step": compare_step,
        "runs": [{
            "echo": d["echo_controlled"],
            "epe_at_compare_step": tail_stats(d["curve"], compare_step)[0],
            "auc_at_compare_step": (
                tail_stats(d["auc_curve"], compare_step)[0]
                if d.get("auc_curve") else None),
            "truncated": d["truncated"],
            "train_samples_per_s": d.get("train_samples_per_s"),
            "curve": d["curve"],
            "auc_curve": d.get("auc_curve"),
        } for d in rows],
        "epe_spread": round(epe_spread, 4),
        "epe_noise_floor": round(max(epe_noises), 4),
        "auc_spread": (round(auc_spread, 4)
                       if auc_spread is not None else None),
        "auc_noise_floor": (round(max(auc_noises), 4)
                            if auc_noises else None),
        "within_noise": bool(
            epe_spread <= max(max(epe_noises), 0.15)
            and (auc_spread is None
                 or auc_spread <= max(max(auc_noises), 0.02))),
    }
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({k: out[k] for k in (
        "compare_step", "epe_spread", "epe_noise_floor", "auc_spread",
        "auc_noise_floor", "within_noise")}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
