"""Source lint: a ``.hint()`` chained onto a JOIN RESULT is a silent
no-op — Spark only logs "join hint specified but not part of a join
relation" and drops it. Round 9 found exactly this in the shared
rarity-index build: the intended shuffle_hash never applied, AQE
broadcast a 3.5 GiB hashed relation at 100x, and the containment
probe read 54x instead of 7.6x. Hints must be attached to a join
INPUT (``a.join(b.hint("shuffle_hash"), key)``), so the pattern
``.join(...).hint(`` is banned repo-wide."""

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "greenplum_cdc_spark",
)

# .join( <args with up to one nesting level> ) .hint(
_POST_JOIN_HINT = re.compile(
    r"\.join\(\s*(?:[^()]|\([^()]*\))*\)\s*\.\s*hint\(", re.S
)


def test_no_post_join_hints():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                src = fh.read()
            for m in _POST_JOIN_HINT.finditer(src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path}:{line}")
    assert not offenders, (
        "post-join .hint() is a no-op (attach the hint to a join "
        f"input instead): {offenders}"
    )
