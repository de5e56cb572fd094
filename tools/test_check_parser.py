#!/usr/bin/env python3
"""Self-test for tools/check.py's GRAFT_ORACLE_EXCLUDE parser (r15
ADVICE: every in-band separator — ';', '||', ',' — can legitimately
appear in a prose rationale, and a mis-split pollutes the CORRECTNESS
artifact with fragment keys; r15 shipped exactly that bug once).

The parser itself is a small pure block inside check.py's main flow, so
this test re-executes the same logic lifted verbatim (kept in sync by
the FRAGMENT of check.py asserted below) rather than importing main()
(which wants a live DuckDB + parquet tree).

Run:  python3 tools/test_check_parser.py
"""
import json
import os
import re
import sys

CHECK = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check.py")


def parse(raw_excl):
    """The exclude-parse contract: JSON object preferred, legacy '||',
    boundary-';' and bare-',' shapes accepted."""
    exclude = {}
    if raw_excl.strip().startswith("{"):
        exclude = {str(k): str(v) for k, v in json.loads(raw_excl).items()}
    else:
        if "=" in raw_excl:
            parts = re.split(r"\|\|" if "||" in raw_excl
                             else r";(?=\s*[A-Za-z0-9_]+\s*=)", raw_excl)
        else:
            parts = raw_excl.split(",")
        for part in parts:
            part = part.strip()
            if not part:
                continue
            name, _, why = part.partition("=")
            exclude[name.strip()] = why.strip()
    return exclude


def test_source_in_sync():
    """The logic above must remain a verbatim lift of check.py's block —
    if check.py's parser changes, this file must change with it."""
    src = open(CHECK).read()
    for fragment in [
        'raw_excl.strip().startswith("{")',
        '{str(k): str(v) for k, v in json.loads(raw_excl).items()}',
        'r";(?=\\s*[A-Za-z0-9_]+\\s*=)"',
    ]:
        assert fragment in src, f"check.py no longer contains: {fragment}"


def test_json_shape_is_separator_proof():
    d = parse(json.dumps({
        "a": "prose with ; and || and , and name=value inside",
        "b": "other; K=32 stays whole"}))
    assert d == {"a": "prose with ; and || and , and name=value inside",
                 "b": "other; K=32 stays whole"}, d


def test_round_final_excl_is_valid_json():
    """The shipped EXCL in round_final.sh must parse as a JSON object
    whose keys are the two declared excludes."""
    rf = os.path.join(os.path.dirname(CHECK), "round_final.sh")
    line = [l for l in open(rf) if l.startswith("EXCL=")][0]
    val = line[len("EXCL='"):].rstrip().rstrip("'")
    d = parse(val)
    assert sorted(d) == ["dedup_incremental_simjoin", "simjoin_prefix"], sorted(d)
    assert all("bound" in v for v in d.values()), \
        "rationales must cite their scaled bound queries"


def test_legacy_pipes():
    d = parse("a=one; two||b=three, four")
    assert d == {"a": "one; two", "b": "three, four"}, d


def test_legacy_semicolon_boundary():
    d = parse("a=why one;b=why two")
    assert d == {"a": "why one", "b": "why two"}, d


def test_legacy_bare_names():
    d = parse("a, b")
    assert d == {"a": "", "b": ""}, d


def test_empty():
    assert parse("") == {}


ALL_TESTS = [v for k, v in sorted(globals().items()) if k.startswith("test_")]

if __name__ == "__main__":
    failed = 0
    for t in ALL_TESTS:
        try:
            t()
            print(f"PASS {t.__name__}")
        except AssertionError as e:
            failed += 1
            print(f"FAIL {t.__name__}: {e}")
    print(f"{len(ALL_TESTS) - failed} pass, {failed} fail")
    sys.exit(1 if failed else 0)
