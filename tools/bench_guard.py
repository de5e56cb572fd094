#!/usr/bin/env python3
"""Round-over-round bench regression guard (VERDICT r06 task 2).

Compares a bench artifact's per-query medians against the previous
round's published medians and flags any query slower than THRESHOLD x
its prior median (absolute floor MIN_SEC filters sub-100ms jitter).

Usage:
    python3 tools/bench_guard.py [current.json] [previous.json]

With no args: current = newest BENCH_SELF_r*.json, previous =
BENCH_CANON.json if present (the pinned clean-run reference — r07's
driver artifact was contention-distorted, so round-over-round "newest"
is not automatically trustworthy), else newest BENCH_SELF_r*.json /
BENCH_r*.json older than the current round. Exit 1 if any query is
flagged — wire it after a bench run to stop a regression shipping as
"the artifact moved". Refresh BENCH_CANON.json (cp the new BENCH_SELF)
whenever a clean run lands on purpose-changed plans.
"""
import os
import glob
import json
import re
import sys

THRESHOLD = 1.5
MIN_SEC = 0.15  # both medians under this: jitter, not a regression


def newest(pattern, below=None):
    """Newest artifact by round number. Accepts suffixed names
    (BENCH_SELF_r09_sf01.json) so a clean re-run is visible to the
    guard, but SKIPS anything carrying the `contended` marker — the
    quarantine protocol (r09 verdict task 5, codifying the r07
    precedent): when two same-round runs disagree >1.3x on total, the
    slower one is renamed *_contended.json and stops being comparable.
    Same-round ties break on mtime (most recent clean run wins)."""
    best, best_n, best_mt = None, -1, -1.0
    for p in glob.glob(pattern) + glob.glob(pattern.replace(".json", "_*.json")):
        if "contended" in os.path.basename(p):
            continue
        m = re.search(r"_r(\d+)(?:_[A-Za-z0-9]+)*\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        if below is not None and n >= below:
            continue
        mt = os.path.getmtime(p)
        if n > best_n or (n == best_n and mt > best_mt):
            best, best_n, best_mt = p, n, mt
    return best, best_n


META_KEYS = {"value", "n_queries", "reps", "shards", "n", "rc", "cpus", "sf"}


def sf_of(path):
    """Normalized scale factor: BENCH_SELF stores the sf DIR string
    ("/root/testdata/sf0.1"), the driver wrapper stores the number
    (0.1) — both must compare equal for the same-sf walk-back."""
    try:
        with open(path) as f:
            raw = json.load(f).get("sf")
    except (OSError, ValueError):
        return None
    if isinstance(raw, (int, float)):
        return float(raw)
    if isinstance(raw, str):
        m = re.search(r"sf([0-9.]+)/?$", raw)
        if m:
            return float(m.group(1))
        return raw
    return raw


def same_content(a, b):
    try:
        import hashlib
        def h(p):
            with open(p, "rb") as f:
                return hashlib.sha256(f.read()).hexdigest()
        return h(a) == h(b)
    except OSError:
        return False


def medians(path):
    """Per-query times from any artifact shape. Prefers per-query MIN
    (VERDICT r08 task 2: medians absorb co-tenant load spikes — doc_quality
    published a 4.09 s median over runs [4.13, 4.09, 1.12]; the min is the
    machine's actual capability and the honest regression key), falling
    back to medians for artifacts predating min publication: BENCH_SELF
    (query_detail or queries), the raw bench stdout line (queries), or the
    driver's wrapper (parsed.queries / scraping its truncated `tail`)."""
    with open(path) as f:
        d = json.load(f)
    if "query_detail" in d:
        return {k: v.get("min", v["median"]) if v.get("min", -1) >= 0
                else v["median"]
                for k, v in d["query_detail"].items()}
    if isinstance(d.get("queries"), dict):
        return dict(d["queries"])
    if isinstance(d.get("parsed"), dict) and isinstance(d["parsed"].get("queries"), dict):
        return dict(d["parsed"]["queries"])
    if isinstance(d.get("tail"), str):
        pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?[0-9]+(?:\.[0-9]+)?)', d["tail"])
        return {k: float(v) for k, v in pairs if k not in META_KEYS}
    return {}


def main():
    if len(sys.argv) >= 3:
        cur_path, prev_path = sys.argv[1], sys.argv[2]
    else:
        cur_path = sys.argv[1] if len(sys.argv) == 2 else None
        if cur_path is None:
            cur_path, cur_n = newest("BENCH_SELF_r*.json")
        else:
            m = re.search(r"_r(\d+)(?:_[A-Za-z0-9]+)*\.json$", cur_path)
            cur_n = int(m.group(1)) if m else None
        # prefer the pinned canonical clean run, then a prior
        # self-published artifact (complete, never truncated), then
        # the driver's wrapper. The canon is refreshed by cp-ing the
        # newest BENCH_SELF into it, so when it is byte-identical to the
        # current artifact (refresh-then-guard: comparing a run against
        # itself can never flag) skip it for the prior-round BENCH_SELF.
        prev_path = None
        if os.path.exists("BENCH_CANON.json") and cur_path:
            if same_content("BENCH_CANON.json", cur_path):
                print("bench_guard: BENCH_CANON.json is identical to "
                      f"{cur_path} (fresh refresh?) — using prior round instead")
            elif sf_of("BENCH_CANON.json") != sf_of(cur_path):
                print("bench_guard: BENCH_CANON.json is at sf="
                      f"{sf_of('BENCH_CANON.json')} but {cur_path} is at "
                      f"sf={sf_of(cur_path)} — cross-sf medians are not "
                      "comparable, using prior same-sf round instead")
            else:
                prev_path = "BENCH_CANON.json"
        if prev_path is None:
            # walk back to the newest prior artifact at the SAME sf
            n = cur_n
            while True:
                cand, n = newest("BENCH_SELF_r*.json", below=n)
                if cand is None or sf_of(cand) == sf_of(cur_path):
                    prev_path = cand
                    break
        if prev_path is None:
            # driver-wrapper fallback, same-sf walk-back applied here too
            # (r09 advice: a bare fallback could compare across scale
            # factors — the exact failure mode the sf checks exist for)
            n = cur_n
            while True:
                cand, n = newest("BENCH_r*.json", below=n)
                if cand is None or sf_of(cand) == sf_of(cur_path):
                    prev_path = cand
                    break
        if prev_path is None:
            print(f"bench_guard: no prior artifact at sf={sf_of(cur_path)} — "
                  "nothing comparable, skipping regression check")
            sys.exit(0)
    if not cur_path or not prev_path:
        print(f"bench_guard: need two artifacts (cur={cur_path}, prev={prev_path})")
        sys.exit(2)

    cur, prev = medians(cur_path), medians(prev_path)
    flagged, improved, new = [], 0, 0
    for name, c in sorted(cur.items()):
        p = prev.get(name)
        if p is None:
            new += 1
            continue
        if c < 0 or p <= 0:
            if c < 0:
                flagged.append((name, p, c, float("inf")))
            continue
        ratio = c / p
        if ratio > THRESHOLD and not (c < MIN_SEC and p < MIN_SEC):
            flagged.append((name, p, c, ratio))
        elif ratio < 1 / THRESHOLD:
            improved += 1

    print(f"bench_guard: {cur_path} vs {prev_path}: "
          f"{len(cur)} queries ({new} new), {improved} improved >{THRESHOLD}x, "
          f"{len(flagged)} flagged >{THRESHOLD}x")
    for name, p, c, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  FLAG {name}: {p:.3f}s -> {c:.3f}s ({r:.2f}x)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
