"""Per-query benchmark delta: compare two bench result files and emit a
markdown table (stdout) flagging regressions.

Usage: python tools/bench_delta.py OLD.json NEW.json [threshold]

Accepts either the driver's wrapper format ({"parsed": {"queries": ...}})
or bench.py's raw one-line JSON. Exit code 1 if any query shared by both
runs slowed by more than `threshold`× (default 2.0) — the round gate from
VERDICT item 6.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:
        data = data["parsed"]
    return data.get("queries", {})


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old, new = _queries(old_path), _queries(new_path)

    rows = []
    regressions = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is not None and n is not None:
            if o <= 0:
                # a 0.000s old timing carries no signal — report, don't gate
                rows.append((name, f"{o:.3f}", f"{n:.3f}", "n/a (old=0)"))
                continue
            ratio = n / o
            flag = " ⚠" if ratio > threshold else ""
            if ratio > threshold:
                regressions.append(name)
            rows.append((name, f"{o:.3f}", f"{n:.3f}", f"{ratio:.2f}×{flag}"))
        elif n is not None:
            rows.append((name, "—", f"{n:.3f}", "new"))
        else:
            rows.append((name, f"{o:.3f}", "—", "dropped"))

    print(f"| query | old (s) | new (s) | ratio |")
    print(f"|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
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
        print(f"REGRESSIONS (> {threshold}×): {regressions}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
