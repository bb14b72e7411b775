"""Per-entry phase timing: charge the operator and its test-corpus
generator separately.

Several gate entries must SYNTHESIZE their input before exercising the
operator (the wal2json parse entries build a JSON feed from `events`;
the streaming pipelines write a Maxwell feed to disk). A single wall
number charges the operator for the generator (VERDICT r5: half of
wal2json_v2_parse_events' bench line was corpus synthesis). Entries
wrap their synthesis step in ``phase(key, "synth")``; bench.py then
reports ``{"synth": s, "op": total - s}`` per instrumented entry in
BENCH_FULL.json. The registry is in-process and reset per invocation
(``reset`` at entry start), so best-of-N bench reps never accumulate.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# entry key -> {"synth": seconds, ...} for the MOST RECENT invocation
PHASE_TIMES: dict[str, dict[str, float]] = {}


def reset(entry: str) -> None:
    PHASE_TIMES[entry] = {}


@contextmanager
def phase(entry: str, name: str):
    """Accumulate wall time of this block under PHASE_TIMES[entry][name]."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        d = PHASE_TIMES.setdefault(entry, {})
        d[name] = round(d.get(name, 0.0) + time.perf_counter() - t0, 3)
