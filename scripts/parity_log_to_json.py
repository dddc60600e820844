#!/usr/bin/env python
"""Reconstruct a parity JSON artifact from a parity.py run log.

parity.py only writes its --json artifact at the END of the run, so a
sweep stopped early (box deadline) would otherwise lose every
completed key's result.  This reads the per-key `ok`/`FAIL`/`!!`
lines and emits the same artifact shape, with a `partial` marker and
the not-yet-run key list so a partial sweep is never mistaken for a
complete one.

Usage: python scripts/parity_log_to_json.py LOG OUT.json SF_DIR \
           [expected_key ...]
"""

from __future__ import annotations

import json
import re
import sys

_OK = re.compile(
    r"^ok (\w+): (\d+) rows \[(\w+)\] ([\d.]+)s"
)
_FAIL = re.compile(r"^FAIL (\w+): (.*)")
_EXC = re.compile(r"^!! (\w+): (.*)")


def main() -> int:
    log, out, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    expected = sys.argv[4:]
    results: dict[str, dict] = {}
    with open(log) as fh:
        for line in fh:
            m = _OK.match(line)
            if m:
                results[m.group(1)] = {
                    "ok": True, "rows": int(m.group(2)),
                    "mode": m.group(3), "sec": float(m.group(4)),
                }
                continue
            m = _FAIL.match(line) or _EXC.match(line)
            if m:
                results[m.group(1)] = {
                    "ok": False, "why": m.group(2)[:500],
                }
    not_run = [k for k in expected if k not in results]
    art = {
        "sf_dir": sf_dir,
        "selector": "named",
        "passed": sum(1 for v in results.values() if v["ok"]),
        "total": len(results),
        "results": results,
    }
    if not_run:
        art["partial"] = True
        art["not_run"] = not_run
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(f"wrote {out}: {art['passed']}/{art['total']} ok"
          + (f", {len(not_run)} not run" if not_run else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
