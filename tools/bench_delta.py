"""Per-query benchmark delta: compare two bench result files and emit a
markdown table (stdout) flagging regressions.

Usage: python tools/bench_delta.py OLD.json NEW.json [threshold]

Accepts either the driver's wrapper format ({"parsed": {"queries": ...}})
or bench.py's raw one-line JSON. When BOTH files carry a same-boot canary
scale (bench.py's CANARY set, VERDICT r9 task 2), every ratio is also
reported host-normalized — ratio / (new_scale / old_scale) — and the
regression gate runs on the NORMALIZED numbers, so a 1.3x-slower host no
longer reads as 300 queries regressing. Without a canary in the old file
(pre-r10 artifacts) the gate falls back to raw ratios, stated in the
output. Exit code 1 on any gated regression above `threshold`x
(default 2.0) — the round gate from VERDICT item 6.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:
        data = data["parsed"]
    return data


def _canary_scale(data: dict) -> float | None:
    c = data.get("canary")
    if isinstance(c, dict) and c.get("scale"):
        return float(c["scale"])
    if data.get("canary_scale"):
        return float(data["canary_scale"])
    return None


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old_data, new_data = _load(old_path), _load(new_path)
    old, new = old_data.get("queries", {}), new_data.get("queries", {})

    old_scale, new_scale = _canary_scale(old_data), _canary_scale(new_data)
    host = None
    if old_scale and new_scale and old_scale > 0:
        host = new_scale / old_scale

    rows = []
    regressions = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is not None and n is not None:
            if o <= 0:
                # a 0.000s old timing carries no signal — report, don't gate
                rows.append((name, f"{o:.3f}", f"{n:.3f}", "n/a (old=0)", ""))
                continue
            ratio = n / o
            gated = ratio / host if host else ratio
            flag = " ⚠" if gated > threshold else ""
            if gated > threshold:
                regressions.append(name)
            rows.append(
                (
                    name,
                    f"{o:.3f}",
                    f"{n:.3f}",
                    f"{ratio:.2f}×{'' if host else flag}",
                    f"{gated:.2f}×{flag}" if host else "",
                )
            )
        elif n is not None:
            rows.append((name, "—", f"{n:.3f}", "new", ""))
        else:
            rows.append((name, f"{o:.3f}", "—", "dropped", ""))

    if host:
        print(
            f"Canary scales: old {old_scale:.3f}s, new {new_scale:.3f}s "
            f"→ host factor {host:.2f}× (gate runs on normalized ratios)"
        )
        print("| query | old (s) | new (s) | raw | normalized |")
        print("|---|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(r) + " |")
    else:
        print(
            "No canary in "
            + ("either file" if not new_scale else "the OLD file")
            + " — gate runs on RAW ratios (host drift not separable)."
        )
        print("| query | old (s) | new (s) | ratio |")
        print("|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(r[:4]) + " |")

    shared = [n for n in new if n in old]
    tot_o = sum(old[n] for n in shared)
    tot_n = sum(new[n] for n in shared)
    ratio_txt = f"({tot_n / tot_o:.2f}×) " if tot_o > 0 else ""
    print(
        f"\nShared-query total: {tot_o:.2f}s → {tot_n:.2f}s "
        f"{ratio_txt}over {len(shared)} queries; "
        f"{len(new) - len(shared)} new."
    )
    if regressions:
        kind = "normalized" if host else "raw"
        print(f"REGRESSIONS ({kind} > {threshold}×): {regressions}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
