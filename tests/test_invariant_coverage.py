"""Meta-test: every registered query key must be referenced by name
somewhere in tests/ beyond the oracle-parity sweep. Round 7 brought
the registry to 100% dedicated-semantic-test coverage (16 invariant
files); this guard makes the convention self-enforcing — registering
a new operator without writing its invariant fails the suite instead
of silently re-opening the gap the round closed."""

from __future__ import annotations

import pathlib

from morphl_model_publishers_churning_users_spark.registry import get_oracles, get_queries

_TESTS_DIR = pathlib.Path(__file__).parent
_THIS_FILE = pathlib.Path(__file__).name


def _test_blob() -> str:
    parts = []
    for f in sorted(_TESTS_DIR.glob("*.py")):
        if f.name in (_THIS_FILE, "test_oracle.py", "conftest.py", "oracle_utils.py"):
            continue
        parts.append(f.read_text())
    return "\n".join(parts)


def test_every_registry_key_has_a_dedicated_test():
    blob = _test_blob()
    missing = [
        k
        for k in get_queries()
        if f"'{k}'" not in blob and f'"{k}"' not in blob
    ]
    assert missing == [], (
        f"{len(missing)} registry key(s) lack a dedicated test beyond "
        f"oracle parity — add semantic invariants in the same commit "
        f"that registers them: {missing}"
    )


def test_every_key_still_has_an_oracle_twin():
    q = set(get_queries())
    o = set(get_oracles())
    assert q == o, (
        f"registry drift: keys without oracle twins {sorted(q - o)}; "
        f"orphan oracles {sorted(o - q)}"
    )
