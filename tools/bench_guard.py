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
# r12 verdict task 8: every round spent adjudication prose on 1-2
# sub-second flags that were pure boot-to-boot drift (word_count
# 0.15->0.26s, zorder_layout 0.33->0.51s, ...). A ratio flag whose
# ABSOLUTE delta is under this floor is reported as drift (informational)
# instead of failing the guard — unless the query was declared touched
# this round via --touched=a,b,c, in which case any ratio flag stands
# (a deliberately-changed plan must never hide behind the floor).
ABS_DELTA_SEC = 0.4


def is_contended(path):
    """Contended artifacts are quarantined two ways: the rename protocol
    (*_contended.json, r09 verdict task 5) and, since r11, a publish-time
    stamp — Bench writes "contended": true when >=5 queries show >3x
    within-shard run spread (the co-tenant load signature calibrated on
    the r07/r09/r10 distorted artifacts). Either marker disqualifies the
    artifact as a comparison reference."""
    if "contended" in os.path.basename(path):
        return True
    try:
        with open(path) as f:
            return bool(json.load(f).get("contended", False))
    except (OSError, ValueError):
        return False


def is_filtered(path):
    """Bench stamps subset runs (SPARK_GRAFT_BENCH_QUERIES) with
    "filtered": true — a subset artifact saved under a BENCH_SELF_r*
    name must never be the regression reference: queries absent from it
    would silently drop out of the per-query comparison (r12 ADVICE).
    Quarantined exactly like the contended stamp."""
    try:
        with open(path) as f:
            return bool(json.load(f).get("filtered", False))
    except (OSError, ValueError):
        return False


def candidates(pattern, below=None):
    """All non-contended, non-filtered artifacts matching `pattern`
    (suffixed names like BENCH_SELF_r09_sf01.json included), sorted
    newest first by (round number, mtime). Returned as (path, round)
    pairs so callers can walk back through EVERY comparable artifact —
    picking one per round (the pre-r11 shape) skipped a whole round
    whenever its newest artifact happened to be at a different sf than
    the current run (r10 ADVICE)."""
    out = []
    for p in glob.glob(pattern) + glob.glob(pattern.replace(".json", "_*.json")):
        if is_contended(p) or is_filtered(p):
            continue
        m = re.search(r"_r(\d+)(?:_[A-Za-z0-9]+)*\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        if below is not None and n >= below:
            continue
        out.append((p, n, os.path.getmtime(p)))
    out.sort(key=lambda x: (-x[1], -x[2]))
    return [(p, n) for p, n, _ in out]


def newest(pattern, below=None):
    """Newest non-contended artifact by round number (mtime tie-break)."""
    cs = candidates(pattern, below)
    return cs[0] if cs else (None, -1)


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
    touched = set()
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--touched="):
            touched.update(q for q in a[len("--touched="):].split(",") if q)
        else:
            argv.append(a)
    if len(argv) >= 2:
        cur_path, prev_path = argv[0], argv[1]
    else:
        cur_path = argv[0] if len(argv) == 1 else None
        if cur_path is None:
            cur_path, cur_n = newest("BENCH_SELF_r*.json")
        else:
            m = re.search(r"_r(\d+)(?:_[A-Za-z0-9]+)*\.json$", cur_path)
            cur_n = int(m.group(1)) if m else None
        # prefer the ANCHORED same-sf per-query baseline (r14 VERDICT
        # task 4: tools/rebaseline.py publishes a clean run as the
        # standing denominator, so the guard compares like-for-like
        # instead of chasing whatever last round published), then the
        # pinned canonical clean run, then a prior self-published
        # artifact (complete, never truncated), then the driver's
        # wrapper. The canon is refreshed by cp-ing the newest
        # BENCH_SELF into it, so when it is byte-identical to the
        # current artifact (refresh-then-guard: comparing a run against
        # itself can never flag) skip it for the prior-round BENCH_SELF.
        prev_path = None
        for bp in sorted(glob.glob("BASELINE_PERQUERY_*.json")):
            if sf_of(bp) == sf_of(cur_path) and not same_content(bp, cur_path):
                prev_path = bp
                print(f"bench_guard: using anchored baseline {bp} "
                      f"(sf={sf_of(bp)})")
                break
        if prev_path is None and os.path.exists("BENCH_CANON.json") and cur_path:
            if same_content("BENCH_CANON.json", cur_path):
                print("bench_guard: BENCH_CANON.json is identical to "
                      f"{cur_path} (fresh refresh?) — using prior round instead")
            elif is_filtered("BENCH_CANON.json"):
                print("bench_guard: BENCH_CANON.json is a FILTERED subset "
                      "run — not a regression reference, using prior round "
                      "instead")
            elif sf_of("BENCH_CANON.json") != sf_of(cur_path):
                print("bench_guard: BENCH_CANON.json is at sf="
                      f"{sf_of('BENCH_CANON.json')} but {cur_path} is at "
                      f"sf={sf_of(cur_path)} — cross-sf medians are not "
                      "comparable, using prior same-sf round instead")
            else:
                prev_path = "BENCH_CANON.json"
        if prev_path is None:
            # walk back through EVERY prior artifact (not one per round —
            # r10 ADVICE) to the newest one at the SAME sf
            for cand, _ in candidates("BENCH_SELF_r*.json", below=cur_n):
                if sf_of(cand) == sf_of(cur_path):
                    prev_path = cand
                    break
        if prev_path is None:
            # driver-wrapper fallback, same-sf walk-back applied here too
            # (r09 advice: a bare fallback could compare across scale
            # factors — the exact failure mode the sf checks exist for)
            for cand, _ in candidates("BENCH_r*.json", below=cur_n):
                if sf_of(cand) == sf_of(cur_path):
                    prev_path = cand
                    break
        if prev_path is None:
            print(f"bench_guard: no prior artifact at sf={sf_of(cur_path)} — "
                  "nothing comparable, skipping regression check")
            sys.exit(0)
    if not cur_path or not prev_path:
        print(f"bench_guard: need two artifacts (cur={cur_path}, prev={prev_path})")
        sys.exit(2)

    if is_contended(cur_path):
        print(f"bench_guard: WARNING — {cur_path} is stamped/renamed as "
              "CONTENDED; its medians are machine noise. Comparison below "
              "keys on per-query min, but re-run on an idle machine before "
              "trusting any flag in either direction.")

    cur, prev = medians(cur_path), medians(prev_path)
    flagged, drifted, improved, new = [], [], 0, 0
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
            if abs(c - p) < ABS_DELTA_SEC and name not in touched:
                drifted.append((name, p, c, ratio))
            else:
                flagged.append((name, p, c, ratio))
        elif ratio < 1 / THRESHOLD:
            improved += 1

    print(f"bench_guard: {cur_path} vs {prev_path}: "
          f"{len(cur)} queries ({new} new), {improved} improved >{THRESHOLD}x, "
          f"{len(flagged)} flagged >{THRESHOLD}x, "
          f"{len(drifted)} drift-ignored (|delta| < {ABS_DELTA_SEC}s, untouched)")
    for name, p, c, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  FLAG {name}: {p:.3f}s -> {c:.3f}s ({r:.2f}x)")
    for name, p, c, r in sorted(drifted, key=lambda x: -x[3]):
        print(f"  drift {name}: {p:.3f}s -> {c:.3f}s ({r:.2f}x) — "
              "boot-to-boot noise, not failing the guard")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
