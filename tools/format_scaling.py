#!/usr/bin/env python3
"""Dev tool: recompute SCALE.md's measured-scaling-curve family table
from three graft.Bench sidecars (one per scale factor).

Usage: python3 tools/format_scaling.py sf0001.json sf001.json sf01.json
Prints the markdown table (family warm-min sums + step ratios).
"""
import json
import sys

FAMILIES = [
    ("relational + pivot + sketches + SCD2/PIT/bloom/profile/CDC/HLL "
     "(q01-q19, q38-q39, q104-q105, q114, q122-q123, q126-q127, q135, "
     "q138, q160, q175, q182, q186, q189, q200, q204)",
     ["q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09", "q10_",
      "q11_", "q12_", "q13_", "q14_", "q15_", "q16_", "q17_", "q18_",
      "q19_",
      "q38", "q39", "q104", "q105", "q114", "q122", "q123", "q126", "q127",
      "q135", "q138", "q160", "q175", "q182", "q186", "q189", "q200",
      "q204"]),
    ("events/windows (q20-q29, q73, q101-q102, q106, q108, q119, q136, "
     "q145, q149-q152, q185, q190, q192, q208, q214, q235)",
     ["q20_", "q21_", "q22_", "q23_", "q24_", "q25_", "q26_", "q27_",
      "q28_", "q29_",
      "q73", "q101", "q102", "q106", "q108", "q119", "q136", "q145",
      "q149", "q150", "q151", "q152", "q185", "q190", "q192", "q208",
      "q214", "q235"]),
    ("graph (q30-q35, q74-q75, q89, q107, q110, q118, q121, q147, q154, "
     "q203, q209, q215, q221)",
     ["q30", "q31", "q32", "q33", "q34", "q35", "q74", "q75", "q89",
      "q107", "q110", "q118", "q121", "q147", "q154", "q203", "q209",
      "q215", "q221"]),
    ("temporal joins (q36-q37, q191)", ["q36", "q37", "q191"]),
    ("text (q40-q49, q69, q88, q109, q111-q112, q139, q148, q156, q196, q198, q230-q231, q233-q234, q236)",
     ["q40", "q41", "q42", "q43", "q44", "q45", "q46", "q47", "q48", "q49",
      "q69", "q88", "q109", "q111", "q112", "q139", "q148", "q156",
      "q196", "q198", "q230", "q231", "q233", "q234", "q236"]),
    ("dedup + decontamination + sampling + linkage (q50-q59, q87, q140, "
     "q144, q162, q177, q181, q184, q193, q199, q220, q227, q232)",
     ["q50", "q51", "q52", "q53", "q54", "q55", "q56", "q57", "q58", "q59",
      "q87", "q140", "q144", "q162", "q177", "q181", "q184", "q193",
      "q199", "q220", "q227", "q232"]),
    ("similarity/ANN (q60-q68, q115, q146, q226)",
     ["q60", "q61", "q62", "q63", "q64", "q65", "q66", "q67", "q68",
      "q115", "q146", "q226"]),
    ("scoring/monitoring (q137, q141-q143, q205, q210, q213, q216, "
     "q218-q219, q228-q229, q238)",
     ["q137", "q141", "q142", "q143", "q205", "q210", "q213", "q216",
      "q218", "q219", "q228", "q229", "q238"]),
    ("tag/sequence mining (q70-q72, q124)", ["q70", "q71", "q72", "q124"]),
    ("behavior (q76-q77, q116-q117, q120, q159, q163, q188, q201, "
     "q207, q211, q222-q224, q237)",
     ["q76", "q77", "q116", "q117", "q120", "q159", "q163", "q188",
      "q201", "q207", "q211", "q222", "q223", "q224", "q237"]),
    ("sources/layout + lakehouse (q103, q125, q131-q132, q134, q155, "
     "q165-q167, q170-q173, q176, q178-q180, q217)",
     ["q103", "q125", "q131", "q132", "q134", "q155", "q165", "q166",
      "q167", "q170", "q171", "q172", "q173", "q176", "q178", "q179",
      "q180", "q217"]),
    ("quality/governance (q129-q130, q133, q153, q157-q158, q161, q164, "
     "q168-q169, q174, q183, q187, q195, q197, q202)",
     ["q129", "q130", "q133", "q153", "q157", "q158", "q161", "q164",
      "q168", "q169", "q174", "q183", "q187", "q195", "q197", "q202"]),
    ("multimodal (q80-q86, q206)",
     ["q80", "q81", "q82", "q83", "q84", "q85", "q86", "q206"]),
    ("fidelity CSV corpus (q90-q97, q225)",
     ["q90", "q91", "q92", "q93", "q94", "q95", "q96", "q97", "q225"]),
    ("streaming (q78-q79, q98-q100, q113, q128, q194, q212)",
     ["q78", "q79", "q98", "q99", "q100", "q113", "q128", "q194",
      "q212"]),
]


def famsum(queries, prefixes):
    out = 0.0
    for name, t in queries.items():
        if any(name.startswith(p) for p in prefixes):
            out += t
    return out


def main(paths):
    runs = [json.load(open(p))["queries"] for p in paths]
    # coverage check: every query lands in exactly one family
    for q in runs[-1]:
        hits = [f for f, ps in FAMILIES
                if any(q.startswith(p) for p in ps)]
        if len(hits) != 1:
            raise SystemExit(f"{q}: in {len(hits)} families: {hits}")
    print("| family | sf0.001 s | sf0.01 s | sf0.1 s | 0.01/0.001 | 0.1/0.01 |")
    print("|---|---|---|---|---|---|")
    tot = [0.0, 0.0, 0.0]
    for fam, ps in FAMILIES:
        s = [famsum(r, ps) for r in runs]
        for i, v in enumerate(s):
            tot[i] += v
        print(f"| {fam} | {s[0]:.2f} | {s[1]:.2f} | {s[2]:.2f} "
              f"| {s[1] / s[0]:.1f}x | {s[2] / s[1]:.1f}x |")
    print(f"| **total** | {tot[0]:.1f} | {tot[1]:.1f} | {tot[2]:.1f} "
          f"| {tot[1] / tot[0]:.1f}x | {tot[2] / tot[1]:.1f}x |")


if __name__ == "__main__":
    main(sys.argv[1:4])
