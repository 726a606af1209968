"""Meta-guard for the registry fold discipline (round 9).

`registry._VERIFIED_ROUND` tags every driver-verified key with the round
of its MOST RECENT driver green. The fold is applied by hand each round
(fold the new CORRECTNESS_r{N} greens, re-tag canaries/reverifies), and
rounds 1-8 validated it by eye. This pins it mechanically against the
committed driver artifacts, both directions:

  * every (key -> round) tag must be backed by a hash_match=true (or,
    for rows-only contracts, rows_match=true with hash never checked)
    row in CORRECTNESS_r{round}.json — a tag pointing at a round where
    the driver did NOT green the key is a fold error;
  * every hash-green key in every CORRECTNESS artifact must be tagged
    with SOME round >= that artifact's (a green the fold forgot would
    silently waste future driver-window slots);
  * _REVERIFY keys must already be driver-verified (reverify semantics:
    re-hash a key whose tag refers to pre-change code — a never-green
    key belongs in the unverified ranks, not _REVERIFY);
  * _CANARY keys must be driver-verified (a canary slot exists to
    re-touch a KNOWN green).

No Spark session needed — pure JSON + registry introspection.
"""

from __future__ import annotations

import glob
import json
import os

from morphl_model_publishers_churning_users_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).removeprefix("CORRECTNESS_r").removesuffix(".json"))
        with open(path) as f:
            out[rnd] = json.load(f)
    return out


def _is_green(row: dict) -> bool:
    # Full-oracle keys: hash_match true. Rows-only contracts (streaming
    # etc.): the driver records rows_match with hash_match absent/None.
    if row.get("hash_match") is True:
        return True
    return row.get("hash_match") is None and row.get("rows_match") is True


def test_every_tag_is_backed_by_its_round_artifact():
    arts = _artifacts()
    assert arts, "no CORRECTNESS_r*.json artifacts found"
    missing = {}
    for key, rnd in registry._VERIFIED_ROUND.items():
        row = arts.get(rnd, {}).get(key)
        if row is None or not _is_green(row):
            missing[key] = (rnd, row)
    assert not missing, (
        f"{len(missing)} _VERIFIED_ROUND tags not backed by a green row in "
        f"their round's CORRECTNESS artifact: {dict(list(missing.items())[:8])}"
    )


def test_every_artifact_green_is_folded():
    arts = _artifacts()
    unfolded = {}
    for rnd, rows in arts.items():
        for key, row in rows.items():
            if not _is_green(row):
                continue
            tag = registry._VERIFIED_ROUND.get(key)
            if tag is None or tag < rnd:
                unfolded[key] = (rnd, tag)
    if unfolded:
        top_tag = max(registry._VERIFIED_ROUND.values())
        fresh_rounds = {rnd for rnd, _ in unfolded.values()}
        if all(rnd > top_tag for rnd in fresh_rounds):
            # Not an operator regression: the driver just landed a new
            # artifact and the next round's fold hasn't been applied yet.
            hint = (
                f"new driver artifact (round {max(fresh_rounds)}) landed — "
                f"apply the staged round-{max(fresh_rounds) + 1} fold "
                f"(registry.py: fold the greens with tag {max(fresh_rounds)}, "
                f"rotate _CANARY, clear _REVERIFY)"
            )
        else:
            hint = "fold error: a green in an already-folded round is untagged"
        raise AssertionError(
            f"{len(unfolded)} driver-green keys missing from the fold (or "
            f"tagged older than a later green) — {hint}: "
            f"{dict(list(unfolded.items())[:8])}"
        )


def test_no_artifact_red_is_trusted():
    """A key that FAILED in round N must not carry tag >= N unless a
    LATER artifact re-greened it (tag must equal that later round)."""
    arts = _artifacts()
    bad = {}
    for rnd, rows in arts.items():
        for key, row in rows.items():
            if _is_green(row):
                continue
            tag = registry._VERIFIED_ROUND.get(key)
            if tag is not None and tag >= rnd:
                relegitimized = tag in arts and _is_green(arts[tag].get(key, {}))
                if not relegitimized:
                    bad[key] = (rnd, tag)
    assert not bad, f"red keys trusted without a later green: {bad}"


def test_reverify_and_canary_point_at_verified_keys():
    # get_queries() loads every operator module, so membership is a real
    # check (ADVICE r9: the old `in QUERIES or True` form was dead code).
    live = registry.get_queries()
    for key in registry._REVERIFY:
        assert key in registry.DRIVER_VERIFIED, f"_REVERIFY key never driver-green: {key}"
        assert key in live, f"_REVERIFY key not registered: {key}"
    for key in registry._CANARY:
        assert key in registry.DRIVER_VERIFIED, f"_CANARY key never driver-green: {key}"
        assert key in live, f"_CANARY key not registered: {key}"


def test_tags_within_known_rounds():
    arts = _artifacts()
    top = max(arts)
    for key, rnd in registry._VERIFIED_ROUND.items():
        assert 1 <= rnd <= top, f"{key} tagged round {rnd}, artifacts go up to {top}"
