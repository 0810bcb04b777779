#!/usr/bin/env python3
"""Classify every registry query by INPUT SCALING (VERDICT r12 item 8).

At-scale claims should cite queries whose input grows with the data;
fixed-shape entries are mechanism certificates (routing, protocol,
codec proofs) whose row counts are SF-decoupled by design. This audit
reads each registered query's source and classifies:

* ``data``  -- reads sf_dir tables (load_table / register_views /
  catalog views): volume grows with SF; valid at-scale witness.
* ``fixed`` -- synthesizes a constant-size shape (spark.range /
  literal frames, no sf_dir table read): certifies a mechanism, not
  scale. q292 is the canonical example (1700-row routing graph at
  every SF).
* ``mixed`` -- reads sf_dir tables AND synthesizes fixture frames
  (e.g. eval digests, probe sets): the data side scales; the fixture
  side is deliberately bounded (broadcast-sized).

Prints a summary + the full fixed/mixed lists, markdown-ready for
COVERAGE.md. Heuristic on source text, kept deliberately simple; the
point is a maintained, re-runnable ledger of which names back at-scale
claims.
"""

from __future__ import annotations

import inspect
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402

_DATA_RE = re.compile(r"load_table|register_views")
_FIXTURE_RE = re.compile(
    r"spark\.range|values_frame|createDataFrame|smallframe"
)


def classify(fn) -> str:
    src = inspect.getsource(fn)
    # follow helper indirection to a FIXPOINT (r14: q293 delegates to
    # _arrow_tar_dir which delegates to llm_ops9._tar_fixture_path --
    # one-level expansion misread it as fixed-shape): expand every
    # module-visible _helper reachable from already-expanded source,
    # including helpers imported from sibling plan modules.
    mod = inspect.getmodule(fn)
    seen: set[str] = set()
    frontier = src
    while True:
        new = ""
        for name in re.findall(r"\b(_[a-z0-9_]+)\(", frontier):
            if name in seen:
                continue
            seen.add(name)
            helper = getattr(mod, name, None)
            if helper is None:
                # helper lives in (and is imported into scope from) a
                # sibling module the fn's own module references
                for sib in list(sys.modules.values()):
                    cand = getattr(sib, name, None) if sib else None
                    if callable(cand) and not isinstance(cand, type):
                        helper = cand
                        break
            if callable(helper) and not isinstance(helper, type):
                try:
                    new += inspect.getsource(helper)
                except (OSError, TypeError):
                    pass
        if not new:
            break
        src += new
        frontier = new
    reads_data = bool(_DATA_RE.search(src))
    makes_fixture = bool(_FIXTURE_RE.search(src))
    if reads_data and makes_fixture:
        return "mixed"
    if reads_data:
        return "data"
    return "fixed"


def main() -> None:
    buckets: dict[str, list[str]] = {"data": [], "mixed": [], "fixed": []}
    for name, spec in all_queries().items():
        buckets[classify(spec.spark)].append(name)
    for kind in ("data", "mixed", "fixed"):
        buckets[kind].sort()
        print(f"{kind}: {len(buckets[kind])}")
    print()
    print("fixed-shape certificates (SF-decoupled by design):")
    for n in buckets["fixed"]:
        print(f"  {n}")
    print()
    print("mixed (data-scaled core + bounded synthetic fixture):")
    for n in buckets["mixed"]:
        print(f"  {n}")


if __name__ == "__main__":
    main()
