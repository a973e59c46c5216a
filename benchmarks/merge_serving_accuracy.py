"""Merge the campaign's per-model int8 accuracy artifacts into ONE file.

VERDICT r4 item 8: ``results_demo/int8_accuracy.json`` held teacher-only
variant rows while the serving story actually ships a distilled student —
the artifact should carry both.  This script rebuilds it from the durable
campaign mirror (``results_demo/pareto/results/int8_acc_*.json``, written
by benchmarks/r5_campaign.sh + int8_accuracy.py --model/--features):

  {
    "teacher":  {... bf16 / int8_fused_shared / delta_vs_bf16 ...},
    "students": {"m_w32_s1": {...}, ...},
    "served_vs_teacher_bf16": {ckpt: {spacing: ssim_delta}},   # the claim
  }

``served_vs_teacher_bf16`` is the number the 5k serving claim is made
against: the int8_fused student (the configuration measured at >5k
slices/s) compared to the full-width bf16 teacher it replaces.

  python benchmarks/merge_serving_accuracy.py \
      [--pareto results_demo/pareto] [--out results_demo/int8_accuracy.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pareto", default="results_demo/pareto")
    p.add_argument("--out", default="results_demo/int8_accuracy.json")
    args = p.parse_args()
    r = os.path.join(args.pareto, "results")

    teacher = json.load(open(os.path.join(r, "int8_acc_teacher.json")))
    students = {}
    for path in sorted(glob.glob(os.path.join(r, "int8_acc_m_*.json"))):
        name = os.path.basename(path)[len("int8_acc_"):-len(".json")]
        students[name] = json.load(open(path))

    served = {}
    for name, s in students.items():
        row = {}
        for sp in ("3mm", "6mm"):
            try:
                row[sp] = round(
                    s["int8_fused_shared"][sp]["ssim_mean"]
                    - teacher["bf16"][sp]["ssim_mean"], 4)
            except KeyError:
                pass
        if row:
            served[name] = row

    # preserve the r3 variant-ladder section across re-merges
    legacy = {}
    if os.path.exists(args.out):
        try:
            prev = json.load(open(args.out))
            if "r3_teacher_variant_ladder" in prev:
                legacy["r3_teacher_variant_ladder"] = (
                    prev["r3_teacher_variant_ladder"])
        except (json.JSONDecodeError, OSError):
            pass

    out = {
        "note": ("teacher + distilled-student int8 serving accuracy, all "
                 "rows measured against the same r5 campaign teacher/store "
                 "(benchmarks/r5_campaign.sh); served_vs_teacher_bf16 = "
                 "int8_fused student SSIM minus bf16 teacher SSIM, the "
                 "configuration/claim pair behind the 5k serving headline"),
        "teacher": teacher,
        "students": students,
        "served_vs_teacher_bf16": served,
        **legacy,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {args.out}  ({len(students)} student rows)")
    for name, row in served.items():
        print(f"  served {name}: {row}")


if __name__ == "__main__":
    main()
