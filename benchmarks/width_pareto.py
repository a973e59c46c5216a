"""Assemble the width/recipe Pareto table for the distilled serving story.

Reads the per-student eval + int8-accuracy artifacts produced by the
round-4 stages (r4_stage2b/2e/2f.sh) plus the width-throughput sweep
(r4_stage2d.sh) and prints one markdown table: width, recipe, bf16 SSIM
gap to the teacher (3mm/6mm), int8_fused serving SSIM gap, and the
measured int8_fused slices/s — the evidence base for BASELINE.md's 5k
claim (VERDICT r3 weak #1: either certify <=0.002 or publish the Pareto).

  python benchmarks/width_pareto.py --demo /tmp/demo [--json out.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


STUDENTS = [
    # (checkpoint dir, width, recipe label)
    ("m_w32_s0", 32, "bf16 seed 0"),
    ("m_w32_s1", 32, "bf16 seed 1"),
    ("m_w32_s2", 32, "bf16 seed 2"),
    ("m_w32_f32a", 32, "fp32 run A"),
    ("m_w32_f32b", 32, "fp32 run B"),
    ("m_w32_ema_s0", 32, "bf16+EMA seed 0"),
    ("m_w32_ema_s1", 32, "bf16+EMA seed 1"),
    ("m_w32_ema_s2", 32, "bf16+EMA seed 2"),
    ("m_w32_tq", 32, "bf16 int8-teacher"),
    ("m_w32_prune_s0", 32, "prune+EMA seed 0"),
    ("m_w32_prune_s1", 32, "prune+EMA seed 1"),
    ("m_w32_prune_s2", 32, "prune+EMA seed 2"),
    ("m_w40", 40, "bf16 seed 0"),
    ("m_w40_prune", 40, "prune+EMA seed 0"),
    ("m_w48", 48, "bf16 seed 0"),
]


def _ssim(d, spacing):
    try:
        return d[spacing]["ssim_mean"]
    except (KeyError, TypeError):
        return None


def load_rows(demo: str):
    r = os.path.join(demo, "results")
    teacher_eval = None
    tpath = os.path.join(r, "unet_test_metrics.json")
    if os.path.exists(tpath):
        teacher_eval = json.load(open(tpath))
    teacher_int8 = None
    tq = os.path.join(r, "int8_acc_teacher.json")
    if os.path.exists(tq):
        teacher_int8 = json.load(open(tq)).get("int8_fused_shared")

    # width -> best measured int8_fused slices/s from the throughput sweep
    thr = {}
    sweep = os.path.join(r, "width_throughput.jsonl")
    if os.path.exists(sweep):
        for line in open(sweep):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if d.get("quant") != "int8_fused":
                continue
            w = d.get("features", 64)
            thr[w] = max(thr.get(w, 0.0), d.get("value", 0.0))

    rows = []
    for ck, width, recipe in STUDENTS:
        ev = os.path.join(demo, ck, "unet_distilled_test_metrics.json")
        if not os.path.exists(ev):
            continue
        e = json.load(open(ev))
        row = {
            "ckpt": ck, "width": width, "recipe": recipe,
            "ssim_3mm": _ssim(e, "3mm"), "ssim_6mm": _ssim(e, "6mm"),
        }
        if teacher_eval:
            for sp in ("3mm", "6mm"):
                s, t = _ssim(e, sp), _ssim(teacher_eval, sp)
                if s is not None and t is not None:
                    row[f"gap_{sp}"] = round(s - t, 4)
        acc = os.path.join(r, f"int8_acc_{ck}.json")
        if os.path.exists(acc):
            fused = json.load(open(acc)).get("int8_fused_shared")
            if fused and teacher_int8:
                for sp in ("3mm", "6mm"):
                    s, t = _ssim(fused, sp), _ssim(teacher_int8, sp)
                    if s is not None and t is not None:
                        row[f"int8_gap_{sp}"] = round(s - t, 4)
        row["int8_fused_slices_per_sec"] = thr.get(width)
        rows.append(row)
    return rows, teacher_eval, teacher_int8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demo", default="/tmp/demo")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    rows, teacher_eval, teacher_int8 = load_rows(args.demo)

    if teacher_eval:
        print(f"teacher (width 64): SSIM {_ssim(teacher_eval,'3mm'):.4f} / "
              f"{_ssim(teacher_eval,'6mm'):.4f} (3mm/6mm)")
    print()
    print("| width | recipe | SSIM 3mm/6mm | gap 3mm/6mm | "
          "int8 gap 3mm/6mm | int8_fused slices/s |")
    print("|---|---|---|---|---|---|")
    for w in rows:
        def f(k):
            v = w.get(k)
            return "—" if v is None else f"{v:+.4f}" if "gap" in k else f"{v:.4f}"
        thr = w.get("int8_fused_slices_per_sec")
        print(f"| {w['width']} | {w['recipe']} "
              f"| {f('ssim_3mm')} / {f('ssim_6mm')} "
              f"| {f('gap_3mm')} / {f('gap_6mm')} "
              f"| {f('int8_gap_3mm')} / {f('int8_gap_6mm')} "
              f"| {int(thr) if thr else '—'} |")

    if args.json:
        with open(args.json, "w") as fjson:
            json.dump({"teacher": teacher_eval, "rows": rows}, fjson, indent=2)
        print(f"\n-> {args.json}")


if __name__ == "__main__":
    main()
