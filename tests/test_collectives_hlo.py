"""Mechanical verification of the sharded solvers' communication claims
(VERDICT r2 item 3): compile on the 8-device CPU mesh, dump optimized HLO,
and count collective instructions.

The enforced invariants:

* tournament kernel (``rowshard_tournament.py``): exactly ONE all_gather
  round per panel — 2 all-gather instructions (the pytree gather of
  candidate rows + global ids, one round on the wire), both inside the SAME
  panel-loop body, and ZERO other collectives in the elimination;
* fused-origin tournament: the same, plus exactly 2 all-reduces in the
  mode-0 tail (psum'd origin + pmax'd unsat) OUTSIDE the panel loop;
* blocked row-sharded kernel (``rowshard_blocked.py``): exactly 2
  all-reduces per pivot (pmin election + psum row broadcast) and zero
  all-gathers.

A regression that silently adds a collective (doubling communication) now
fails here instead of passing every bit-exactness test.
"""

import re

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gf2bv_tpu.parallel import mesh as meshlib
from gf2bv_tpu.parallel import rowshard_blocked as rb
from gf2bv_tpu.parallel import rowshard_tournament as rt

COLLECTIVE_OPS = (
    "all-gather",
    "all-gather-start",
    "all-reduce",
    "all-reduce-start",
    "reduce-scatter",
    "collective-permute",
    "collective-permute-start",
    "all-to-all",
)


def _mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return meshlib.make_mesh(batch=1, rows=8)


def _compiled_hlo(fn, mesh, rows=2048, wp=128):
    a32 = np.zeros((rows, wp), np.uint32)
    sh = NamedSharding(mesh, P(meshlib.ROWS_AXIS, None))
    return fn.lower(jax.device_put(a32, sh)).compile().as_text()


def _collective_lines(txt):
    """{op: [(computation_name, line)]} for every collective instruction."""
    found = {}
    comp = "?"
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w./-]+)\s*(\([^)]*\))?\s*->?.*{\s*(//.*)?$", line)
        if ("{" in line) and ("= " not in line) and m:
            comp = m.group(1)
        for op in COLLECTIVE_OPS:
            if re.search(rf"= \S+ {op}\(", line):
                found.setdefault(op, []).append((comp, line.strip()))
    return found


def _counts(found):
    return {op: len(v) for op, v in found.items()}


def test_tournament_one_gather_round_per_panel_no_other_collectives():
    mesh = _mesh8()
    fn = rt._build(mesh, cols=192, k_panel=64, phase2="jnp", interpret=True)
    found = _collective_lines(_compiled_hlo(fn, mesh))
    counts = _counts(found)

    gathers = found.get("all-gather", []) + found.get("all-gather-start", [])
    # one gather ROUND: the pytree (pf, ids) all_gather is at most 2 HLO
    # instructions, and they must live in the same (panel-loop) computation
    assert 1 <= len(gathers) <= 2, counts
    assert len({c for c, _ in gathers}) == 1, gathers
    for op in COLLECTIVE_OPS:
        if op.startswith("all-gather"):
            continue
        assert counts.get(op, 0) == 0, (op, counts)


def test_tournament_fused_origin_adds_only_the_two_tail_reduces():
    mesh = _mesh8()
    fn = rt._build(
        mesh, cols=192, k_panel=64, phase2="jnp", interpret=True,
        fused_origin=True,
    )
    found = _collective_lines(_compiled_hlo(fn, mesh))
    counts = _counts(found)

    gathers = found.get("all-gather", []) + found.get("all-gather-start", [])
    assert 1 <= len(gathers) <= 2, counts
    gather_comp = {c for c, _ in gathers}
    assert len(gather_comp) == 1, gathers

    reduces = found.get("all-reduce", []) + found.get("all-reduce-start", [])
    # psum'd origin + pmax'd unsat: <= 2 instructions (XLA may combine),
    # and NOT inside the panel loop (they are the mode-0 tail)
    assert 1 <= len(reduces) <= 2, counts
    assert all(c not in gather_comp for c, _ in reduces), (
        "tail reduces leaked into the panel loop",
        reduces,
    )
    assert counts.get("collective-permute", 0) == 0
    assert counts.get("reduce-scatter", 0) == 0


def test_blocked_two_reduces_per_pivot_no_gathers():
    mesh = _mesh8()
    fn = rb._build(mesh, cols=192, k_panel=64, phase2="jnp")
    found = _collective_lines(_compiled_hlo(fn, mesh))
    counts = _counts(found)

    reduces = found.get("all-reduce", []) + found.get("all-reduce-start", [])
    # pmin election + psum pivot-row broadcast, both in the pivot loop body
    assert len(reduces) == 2, counts
    assert len({c for c, _ in reduces}) == 1, reduces
    for op in COLLECTIVE_OPS:
        if op.startswith("all-reduce"):
            continue
        assert counts.get(op, 0) == 0, (op, counts)
