"""Merge the controlled data-echoing ablation runs (tools/echo_ablation.sh)
into one CONVERGENCE_r05 artifact (VERDICT r4 task #5).

The three runs share EVERYTHING except the pinned echo factor -- task
(synthetic occluded flow), dataset seed, loader seed, augmentation RNG, LR
schedule, step budget -- so any difference in final EPE / occlusion-AUC is
attributable to batch reuse alone. ``within_noise`` compares the spread of
final metrics across echo levels against the run-internal tail variation
(max - min over the last 4 evaluation points of each run): echoing is
benign iff the cross-run spread does not exceed the within-run tail noise.

    python tools/merge_echo_ablation.py /tmp/CONV_echo1.json \
        /tmp/CONV_echo8.json /tmp/CONV_echo64.json --out CONVERGENCE_r05.json
"""

import argparse
import json


def tail_noise(curve, k=4):
    tail = [v for _, v in curve[-k:]]
    return max(tail) - min(tail)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--out", default="CONVERGENCE_r05.json")
    args = p.parse_args(argv)

    rows = []
    for path in args.runs:
        with open(path) as fp:
            d = json.load(fp)
        assert d.get("echo_controlled"), f"{path}: not a controlled-echo run"
        rows.append(d)
    rows.sort(key=lambda d: d["echo_controlled"])

    base = rows[0]
    for d in rows[1:]:  # the control variables really are identical
        for k in ("task", "steps", "batch", "target_shape", "lr",
                  "lr_schedule", "q", "train_pairs", "val_pairs"):
            assert d[k] == base[k], (k, d[k], base[k])

    epes = [d["final_epe"] for d in rows]
    aucs = [d.get("final_occ_auc") for d in rows]
    epe_noise = max(tail_noise(d["curve"]) for d in rows)
    auc_noise = (max(tail_noise(d["auc_curve"]) for d in rows)
                 if all(a is not None for a in aucs) else None)
    epe_spread = max(epes) - min(epes)
    auc_spread = (max(aucs) - min(aucs)
                  if all(a is not None for a in aucs) else None)

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
        "runs": [{
            "echo": d["echo_controlled"],
            "final_epe": d["final_epe"],
            "final_occ_auc": d.get("final_occ_auc"),
            "train_samples_per_s": d["train_samples_per_s"],
            "curve": d["curve"],
            "auc_curve": d.get("auc_curve"),
        } for d in rows],
        "final_epe_spread": round(epe_spread, 4),
        "epe_tail_noise": round(epe_noise, 4),
        "final_auc_spread": (round(auc_spread, 4)
                             if auc_spread is not None else None),
        "auc_tail_noise": (round(auc_noise, 4)
                           if auc_noise is not None else None),
        "within_noise": bool(
            epe_spread <= max(epe_noise, 0.15)
            and (auc_spread is None or auc_spread <= max(auc_noise, 0.02))),
        "all_passed_bound": all(d["passed"] for d in rows),
    }
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({k: out[k] for k in (
        "final_epe_spread", "epe_tail_noise", "final_auc_spread",
        "auc_tail_noise", "within_noise", "all_passed_bound")}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
