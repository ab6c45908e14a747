"""Cross-SF scaling report: flag super-linear entries (r7 VERDICT task 2).

Input: two --json artifacts from tools/time_all.py at different scale
factors (e.g. sf0.1 and the synthesized sf1 from tools/make_sf.py).
Output: docs/SCALING_SF1.md — per-entry runtime ratio vs the data-size
multiplier, sorted worst-first, with a FLAG on every entry whose ratio
exceeds the multiplier by the tolerance (super-linear growth — the local
proxy for "dies at the next 10x").

    python tools/scaling_report.py small.json big.json [--mult 10]
        [--tol 1.5] [--min-sec 2.0] [--out docs/SCALING_SF1.md]

An entry is flagged only if BOTH (a) ratio > mult * tol and (b) its
big-SF runtime exceeds --min-sec: at sub-second runtimes the per-query
constant (Catalyst compile, job scheduling) dominates and ratios are
noise. Conversely an entry whose big-SF time is large in absolute terms
is listed prominently even when linear — linear-but-huge is where the
100 TB wall-clock goes.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import SCALE_TWINS  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]

    def opt(name: str, default: float) -> float:
        if name in args:
            i = args.index(name)
            v = float(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    mult = opt("--mult", 10.0)
    tol = opt("--tol", 1.5)
    min_sec = opt("--min-sec", 2.0)
    out_path = "docs/SCALING_SF1.md"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if len(args) != 2:
        sys.exit(__doc__)
    small = json.load(open(args[0]))
    big = json.load(open(args[1]))
    st, bt = small["timings"], big["timings"]

    rows = []
    for name in sorted(set(st) & set(bt)):
        ratio = bt[name] / st[name] if st[name] > 0 else float("inf")
        flagged = ratio > mult * tol and bt[name] >= min_sec
        rows.append((ratio, name, st[name], bt[name], flagged))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[4]]
    missing = sorted((set(st) | set(bt)) - (set(st) & set(bt)))
    errors = sorted(set(big.get("errors", [])) | set(small.get("errors", [])))

    lines = [
        "# SF-scaling audit (generated — `python tools/scaling_report.py`)",
        "",
        f"Small: `{small['sf_dir']}` — big: `{big['sf_dir']}` "
        f"(x{mult:.0f} rows, synthesized by `tools/make_sf.py`).",
        f"Flag rule: ratio > {mult:.0f}x{tol} AND big-SF time >= {min_sec}s.",
        "",
        f"**{len(rows)} entries compared, {len(flagged)} flagged "
        f"super-linear, {len(errors)} errors.**",
        "",
        "A FLAG is a measurement, not necessarily a defect. Two"
        " classes (r8 analysis, ROUND_NOTES r11): (1) fixed-cardinality"
        " block keys → per-block pairs quadratic — fixed via the"
        " prefix-filtered / scaled-bucket twins named in the verdict"
        " column, which produce the same (or production-grade) result"
        " under a content-bounded candidate plan; (2) OUTPUT-mass"
        " growth — the ×10 replica synthesis multiplies true near-dup"
        " pairs ×100, and any exact pair listing is linear in its"
        " output (`sim_lsh_hyperplane`, itself the banded scale path)."
        " Entries whose verdict names a scale twin are exact baselines"
        " to keep; use the twin at scale.",
        "",
    ]
    if errors:
        lines += ["Errors: " + ", ".join(f"`{e}`" for e in errors), ""]
    if missing:
        lines += [
            "Not compared (missing on one side): "
            + ", ".join(f"`{m}`" for m in missing),
            "",
        ]
    lines += [
        "| entry | small s | big s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for ratio, name, s, b, flag in rows:
        verdict = "**FLAG super-linear**" if flag else (
            "sub-linear/const" if ratio <= mult else "linear-ish"
        )
        if name in SCALE_TWINS:
            verdict += f" — scale twin `{SCALE_TWINS[name]}`"
        lines.append(f"| `{name}` | {s:.2f} | {b:.2f} | {ratio:.1f}x | {verdict} |")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"{out_path}: {len(rows)} compared, {len(flagged)} flagged, "
          f"{len(errors)} errors")
    for ratio, name, s, b, _ in flagged:
        print(f"  FLAG {name}: {s:.2f}s -> {b:.2f}s ({ratio:.1f}x)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
