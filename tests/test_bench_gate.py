"""bench.py's pruned-tier quality gate (check_prune_quality).

The gate is operating-point-aware: it looks up the PRUNING_MATRIX.json
cell matching (prune_k, topk_mode, topk_recall) and warns when the cell
is missing or its best-cosine delta exceeds the 0.01 bound. Pinned here
against a synthetic matrix so the committed matrix can evolve freely.
"""

import importlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    bench = importlib.import_module("bench")
    matrix = {
        "weights": "synthetic",
        "cells": {
            "sequential/free/prune5": {
                "caption_exact": 0.5, "token_agreement": 0.7,
                "best_cosine_delta": 0.004, "speedup": 10.0,
            },
            "sequential/free/prune5+approx0.95": {
                "caption_exact": 0.0, "token_agreement": 0.4,
                "best_cosine_delta": 0.012, "speedup": 12.0,
            },
            "sequential/free/prune5+approx0.95+final_exact": {
                "caption_exact": 0.9, "token_agreement": 0.9,
                "best_cosine_delta": 0.0005, "speedup": 8.0,
            },
        },
    }
    with open(tmp_path / "PRUNING_MATRIX.json", "w") as f:
        json.dump(matrix, f)
    # point the gate at the synthetic matrix (the gate resolves the path
    # relative to bench.__file__)
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    return bench


def _gate_stderr(bench, capsys, *, prune, mode="exact", recall=0.95,
                 final_exact=False, quant="none", stage1="proxy",
                 stage1_pct=None, precut=0, ctl=None):
    for name, val in (("PRUNE", prune), ("TOPK_MODE", mode),
                      ("TOPK_RECALL", recall),
                      ("PRUNE_FINAL_EXACT", final_exact),
                      ("QUANT", quant), ("STAGE1", stage1),
                      ("STAGE1_PRECUT", precut), ("CTL", ctl)):
        setattr(bench, name, val)
    bench.EFFECTIVE.pop("quant", None)  # gate falls back to QUANT
    if stage1_pct is None:
        bench.EFFECTIVE.pop("stage1_pct", None)
    else:
        bench.EFFECTIVE["stage1_pct"] = stage1_pct
    bench.check_prune_quality()
    return capsys.readouterr().err


def test_exact_cell_under_gate_is_silent(bench_mod, capsys):
    assert _gate_stderr(bench_mod, capsys, prune=5) == ""


def test_approx_cell_over_gate_warns(bench_mod, capsys):
    err = _gate_stderr(bench_mod, capsys, prune=5, mode="approx")
    assert "+0.0120" in err and "quality-degraded" in err


def test_largest_sample_cell_decides(bench_mod, capsys):
    # an @n<N> re-measure supersedes the noisier 4-image default cell:
    # over-gate at @n16 warns even though the base cell is under...
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.004},
        "sequential/free/prune5@n16": {"best_cosine_delta": 0.02},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "+0.0200" in err and "quality-degraded" in err
    # ...and an under-gate @n16 silences an over-gate base cell
    cells["sequential/free/prune5"]["best_cosine_delta"] = 0.02
    cells["sequential/free/prune5@n16"]["best_cosine_delta"] = 0.004
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    assert _gate_stderr(bench_mod, capsys, prune=5) == ""


def test_hybrid_gates_on_its_tighter_final_exact_cell(bench_mod, capsys):
    # approx alone is over the gate; approx+final_exact is under it — the
    # hybrid run must gate on the hybrid cell, not the pure-pruned one
    err = _gate_stderr(bench_mod, capsys, prune=5, mode="approx",
                       final_exact=True)
    assert err == ""


def test_long_context_prefers_len_cell_and_borrow_is_announced(
        bench_mod, capsys):
    # a clip_len=77 bench gates on the @len77 cell when one exists...
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.004},
        "sequential/free/prune5@n8@len77": {"best_cosine_delta": 0.02},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    bench_mod.CLIP_LEN = 77
    try:
        err = _gate_stderr(bench_mod, capsys, prune=5)
        assert "+0.0200" in err and "quality-degraded" in err
        # ...and borrows the clip_len=24 cells (with a note) when none does
        del cells["sequential/free/prune5@n8@len77"]
        with open(path, "w") as f:
            json.dump({"weights": "synthetic", "cells": cells}, f)
        err = _gate_stderr(bench_mod, capsys, prune=5)
        assert "no clip_len=77 quality cell" in err
        assert "quality-degraded" not in err  # the 24-len cell is under
        # a default-length bench never matches @len cells
        bench_mod.CLIP_LEN = 24
        cells["sequential/free/prune5@n16@len77"] = {
            "best_cosine_delta": 0.02}
        with open(path, "w") as f:
            json.dump({"weights": "synthetic", "cells": cells}, f)
        assert _gate_stderr(bench_mod, capsys, prune=5) == ""
    finally:
        bench_mod.CLIP_LEN = 24


def test_gate_is_anchored_to_free_sequential(bench_mod, capsys):
    # cells for OTHER orders / control energies share the prune/mode tail;
    # the bench runs free sequential generation and must gate only on that
    # cell — an over-gate pos (or shuffle) cell may not flag the free
    # number, and a missing free cell may not borrow a ctl one
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.004},
        "sequential/pos/prune5": {"best_cosine_delta": 0.03},
        "shuffle/free/prune5": {"best_cosine_delta": 0.03},
        "sequential/pos/prune5@n16": {"best_cosine_delta": 0.03},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    assert _gate_stderr(bench_mod, capsys, prune=5) == ""
    del cells["sequential/free/prune5"]
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "no cell" in err  # ctl/shuffle cells must not stand in


def test_quant_run_never_borrows_the_fp_cell(bench_mod, capsys):
    # a quantized pruned bench has ADDITIONAL int8 degradation the fp
    # cell never measured — it must warn "no cell" until a +<tier> cell
    # exists, then gate on that cell
    err = _gate_stderr(bench_mod, capsys, prune=5, quant="int8")
    assert "no cell" in err and "sequential/free/prune5+int8" in err
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.004},
        "sequential/free/prune5+int8": {"best_cosine_delta": 0.02},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    err = _gate_stderr(bench_mod, capsys, prune=5, quant="int8")
    assert "+0.0200" in err and "quality-degraded" in err
    # the EFFECTIVE operating point wins over the env request: a CPU run
    # drops quant to none and must gate on the fp cell
    bench_mod.QUANT = "int8"
    bench_mod.EFFECTIVE["quant"] = "none"
    bench_mod.check_prune_quality()
    assert capsys.readouterr().err == ""


def test_factorized_run_gates_on_its_fact_cell(bench_mod, capsys):
    # a factorized-stage1 bench must not borrow the proxy cell (different
    # stage-1 scorer = different quality), and gates on +fact<pct> cells
    # (depth PERCENT of the built tower, EFFECTIVE["stage1_pct"])
    err = _gate_stderr(bench_mod, capsys, prune=5, stage1="factorized",
                       stage1_pct=50)
    assert "no cell" in err and "sequential/free/prune5+fact50 " in err
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.02},
        "sequential/free/prune5+fact50": {"best_cosine_delta": 0.002},
        "sequential/free/prune5+fact50pc24": {"best_cosine_delta": 0.003},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    assert _gate_stderr(bench_mod, capsys, prune=5,
                        stage1="factorized", stage1_pct=50) == ""
    # depth percent is part of the operating point
    err = _gate_stderr(bench_mod, capsys, prune=5, stage1="factorized",
                       stage1_pct=25)
    assert "no cell" in err and "sequential/free/prune5+fact25 " in err
    # the cascade pre-cut is too (and resolves when its cell exists)
    assert _gate_stderr(bench_mod, capsys, prune=5, stage1="factorized",
                        stage1_pct=50, precut=24) == ""
    err = _gate_stderr(bench_mod, capsys, prune=5, stage1="factorized",
                       stage1_pct=50, precut=48)
    assert "no cell" in err and "sequential/free/prune5+fact50pc48 " in err
    # without a built model, the gate falls back to the full-size
    # 12-layer tower for the percent
    bench_mod.STAGE1_LAYERS = 6
    err = _gate_stderr(bench_mod, capsys, prune=5, stage1="factorized")
    assert "sequential/free/prune5+fact50 " not in err  # fact50 cell exists -> no warn
    bench_mod.STAGE1_LAYERS = 2


def test_missing_cell_warns_with_mode_suffix(bench_mod, capsys):
    err = _gate_stderr(bench_mod, capsys, prune=7, mode="approx", recall=0.9)
    assert "no cell" in err and "sequential/free/prune7+approx0.9 " in err
    # a different recall must NOT match the 0.95 approx cell
    err = _gate_stderr(bench_mod, capsys, prune=5, mode="approx", recall=0.9)
    assert "no cell" in err and "sequential/free/prune5+approx0.9 " in err


def test_trained_cells_take_precedence(bench_mod, capsys):
    """The gate prefers trained-tiny (semantic-weights) cells over the
    legacy random-weight cells for the same operating point, and says
    which source decided (tools/trained_quality_cells.py)."""
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    matrix = {
        "weights": "random-full",
        "cells": {"sequential/free/prune5": {"best_cosine_delta": 0.004}},
        "trained": {"weights": "trained-tiny", "cells": {
            "sequential/free/prune5@n32": {"best_cosine_delta": 0.02}}},
    }
    with open(path, "w") as f:
        json.dump(matrix, f)
    # over-gate trained cell warns even though the random cell is under
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "+0.0200" in err and "quality-degraded" in err
    assert "trained-tiny" in err
    # an under-gate trained cell announces the source and stays quiet
    matrix["trained"]["cells"]["sequential/free/prune5@n32"][
        "best_cosine_delta"] = 0.003
    with open(path, "w") as f:
        json.dump(matrix, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "quality gate: trained-tiny" in err and "+0.0030" in err
    assert "quality-degraded" not in err
    # an operating point with NO trained cell falls back to random cells
    matrix["cells"]["sequential/free/prune5+approx0.95"] = {
        "best_cosine_delta": 0.02}
    with open(path, "w") as f:
        json.dump(matrix, f)
    err = _gate_stderr(bench_mod, capsys, prune=5, mode="approx")
    assert "quality-degraded" in err and "random-full" in err


def test_attr_recall_drop_warns_even_under_gate(bench_mod, capsys):
    """r5 secondary axis: a trained cell that PASSES the Δcos gate but
    records a >0.10 attribute-recall drop still warns — the ctlrank
    tiers measured Δcos-neutral while attr-recall fell 0.84→0.55."""
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    matrix = {
        "weights": "random-full", "cells": {},
        "trained": {"weights": "trained-tiny", "cells": {
            "sequential/free/prune5@n32": {
                "best_cosine_delta": -0.005,
                "attr_recall_full": 0.84, "attr_recall_pruned": 0.55}}},
    }
    with open(path, "w") as f:
        json.dump(matrix, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "attribute recall drops 0.84" in err and "0.55" in err
    assert "quality-degraded" not in err  # Δcos gate itself passes
    # a small drop stays quiet
    cell = matrix["trained"]["cells"]["sequential/free/prune5@n32"]
    cell["attr_recall_pruned"] = 0.80
    with open(path, "w") as f:
        json.dump(matrix, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "attribute recall" not in err
    # cells without the attr fields (legacy/random) never trip it
    del cell["attr_recall_full"], cell["attr_recall_pruned"]
    with open(path, "w") as f:
        json.dump(matrix, f)
    err = _gate_stderr(bench_mod, capsys, prune=5)
    assert "attribute recall" not in err


def test_best_quality_bounded_point(bench_mod):
    """bench's JSON line carries the fastest PUBLISHED ladder point whose
    gate cell is under 0.01 (VERDICT r3 item 7): over-gate points are
    skipped, trained cells decide when present."""
    base = os.path.dirname(bench_mod.__file__)
    ladder = {"points": [
        {"name": "fast-but-over", "caps_per_s": 95.0,
         "gate_cell": "sequential/free/prune2+approx0.9", "session": "s"},
        {"name": "fast-under", "caps_per_s": 82.0,
         "gate_cell": "sequential/free/prune3+approx0.9", "session": "s"},
        {"name": "slow-under", "caps_per_s": 52.0,
         "gate_cell": "sequential/free/prune5", "session": "s"},
    ]}
    matrix = {
        "weights": "random-full",
        "cells": {
            "sequential/free/prune2+approx0.9@n16":
                {"best_cosine_delta": 0.0114},
            "sequential/free/prune3+approx0.9@n32":
                {"best_cosine_delta": 0.0083},
            "sequential/free/prune5@n16": {"best_cosine_delta": 0.0063},
        },
    }
    with open(os.path.join(base, "LADDER.json"), "w") as f:
        json.dump(ladder, f)
    with open(os.path.join(base, "PRUNING_MATRIX.json"), "w") as f:
        json.dump(matrix, f)
    pt = bench_mod.best_quality_bounded_point()
    assert pt["config"] == "fast-under"
    assert pt["captions_per_sec"] == 82.0
    assert pt["gate_cell"] == "sequential/free/prune3+approx0.9@n32"
    assert pt["weights"] == "random-full"
    # a trained cell flips the decision: fast-under goes over-gate on
    # semantic weights -> the slower point wins, labeled trained-tiny
    matrix["trained"] = {"weights": "trained-tiny", "cells": {
        "sequential/free/prune3+approx0.9@n32":
            {"best_cosine_delta": 0.02},
        "sequential/free/prune5@n32": {"best_cosine_delta": 0.001},
    }}
    with open(os.path.join(base, "PRUNING_MATRIX.json"), "w") as f:
        json.dump(matrix, f)
    pt = bench_mod.best_quality_bounded_point()
    assert pt["config"] == "slow-under" and pt["weights"] == "trained-tiny"


def test_best_point_skips_ctl_and_superseded_rows(bench_mod):
    """r5: the flagship slot compares like with like — ctl-mode ladder
    rows (a different task) and rows superseded by a program change
    (ctlrank) never resolve, even when faster and under-gate."""
    base = os.path.dirname(bench_mod.__file__)
    ladder = {"points": [
        {"name": "ctl-fast", "caps_per_s": 90.0, "mode": "pos",
         "gate_cell": "sequential/pos/prune3", "session": "s"},
        {"name": "old-program", "caps_per_s": 85.0, "mode": "free",
         "superseded": "replaced",
         "gate_cell": "sequential/free/prune3", "session": "s"},
        {"name": "free-under", "caps_per_s": 50.0, "mode": "free",
         "gate_cell": "sequential/free/prune5", "session": "s"},
    ]}
    matrix = {"weights": "random-full", "cells": {
        "sequential/pos/prune3@n32": {"best_cosine_delta": 0.001},
        "sequential/free/prune3@n32": {"best_cosine_delta": 0.001},
        "sequential/free/prune5@n32": {"best_cosine_delta": 0.001},
    }}
    with open(os.path.join(base, "LADDER.json"), "w") as f:
        json.dump(ladder, f)
    with open(os.path.join(base, "PRUNING_MATRIX.json"), "w") as f:
        json.dump(matrix, f)
    pt = bench_mod.best_quality_bounded_point()
    assert pt["config"] == "free-under"


def test_cell_key_builder_matches_the_gate_grammar():
    """The producers build keys via tools/validate_pruning.cell_key;
    bench's gate matches its own standalone copy of the grammar. Pin the
    builder's output against the same regex the committed matrix is
    pinned to, across every suffix dimension."""
    import itertools
    import re

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from validate_pruning import cell_key

    pat = re.compile(
        r"^(sequential|shuffle|span|random|parallel)/"
        r"(free|sentiment|pos)/prune\d+(\+fact\d+(?:pc\d+(?:t\d+)?)?)?"
        r"(\+ctlrank)?"
        r"(\+approx0\.\d+)?(\+final_exact)?(\+int8(?:_all)?)?"
        r"(@n\d+)?(@len\d+)?(@s\d+)?$"
    )
    for mode, fe, quant, n, ln, seed, s1, pc, cr in itertools.product(
        ("exact", "approx"), (False, True), ("none", "int8", "int8_all"),
        (4, 16), (24, 77), (0, 1), ("proxy", "factorized"), (0, 24),
        (False, True),
    ):
        key = cell_key(ctl="pos", prune_k=5, topk_mode=mode, recall=0.9,
                       final_exact=fe, quant=quant, n_images=n,
                       clip_len=ln, seed=seed, stage1=s1, precut=pc,
                       ctl_rank=cr)
        assert pat.match(key), key
    # and the exact strings bench's gate builds for its lookups
    assert cell_key(prune_k=5) == "sequential/free/prune5"
    assert cell_key(prune_k=5, topk_mode="approx", recall=0.95,
                    final_exact=True, quant="int8_all") == \
        "sequential/free/prune5+approx0.95+final_exact+int8_all"
    assert cell_key(prune_k=3, stage1="factorized", stage1_pct=25,
                    topk_mode="approx", recall=0.9) == \
        "sequential/free/prune3+fact25+approx0.9"
    assert cell_key(prune_k=3, stage1="factorized", stage1_pct=50,
                    precut=24, topk_mode="approx", recall=0.9) == \
        "sequential/free/prune3+fact50pc24+approx0.9"
    # the r5 two-stage cascade: tower pre-cut depth percent suffix
    assert cell_key(prune_k=3, stage1="factorized", stage1_pct=50,
                    precut=24, precut_tower_pct=17,
                    topk_mode="approx", recall=0.9) == \
        "sequential/free/prune3+fact50pc24t17+approx0.9"
    key = cell_key(ctl="pos", prune_k=5, stage1="factorized",
                   stage1_pct=50, precut=24, precut_tower_pct=17,
                   clip_len=77, n_images=16)
    assert pat.match(key), key
    # the r5 control-aware stage-1 rank: +ctlrank sits between the fact
    # segment and +approx (bench's gate builds the same order)
    assert cell_key(ctl="sentiment", prune_k=3, stage1="factorized",
                    stage1_pct=50, precut=96, topk_mode="approx",
                    recall=0.9, ctl_rank=True, n_images=32) == \
        "sequential/sentiment/prune3+fact50pc96+ctlrank+approx0.9@n32"


def test_committed_matrix_keys_parse():
    """Every cell key in the COMMITTED PRUNING_MATRIX.json must follow the
    grammar bench.py's gate matches — a typo'd key would silently un-gate
    its operating point (the gate would report 'no cell ... unmeasured')."""
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PRUNING_MATRIX.json")
    if not os.path.exists(path):
        pytest.skip("no committed matrix")
    with open(path) as f:
        matrix = json.load(f)
    pat = re.compile(
        r"^(sequential|shuffle|span|random|parallel)/"
        r"(free|sentiment|pos)/prune\d+(\+fact\d+(?:pc\d+(?:t\d+)?)?)?"
        r"(\+ctlrank)?"
        r"(\+approx0\.\d+)?(\+final_exact)?(\+int8(?:_all)?)?"
        r"(@n\d+)?(@len\d+)?(@s\d+)?$"
    )
    all_cells = dict(matrix["cells"])
    all_cells.update(matrix.get("trained", {}).get("cells", {}))
    bad = [k for k in all_cells if not pat.match(k)]
    assert not bad, bad
    # and every cell carries the gate's metric
    missing = [k for k, c in all_cells.items()
               if "best_cosine_delta" not in c]
    assert not missing, missing


def test_ctl_bench_gates_on_its_ctl_cell(bench_mod, capsys):
    # CONZIC_BENCH_CTL=pos must gate on sequential/pos/... — never the
    # free cell (and vice versa: the free bench never borrows ctl cells,
    # test_gate_is_anchored_to_free_sequential)
    # ctl bench runs default to the ctl-aware stage-1 rank (r5), so the
    # gate looks up the +ctlrank cell — a cosine-ranked r4 ctl cell must
    # NOT gate the ctlrank program (different selection semantics)
    cells = {
        "sequential/free/prune5": {"best_cosine_delta": 0.004},
        "sequential/pos/prune5": {"best_cosine_delta": 0.9},  # stale r4
        "sequential/pos/prune5+ctlrank": {"best_cosine_delta": 0.02},
    }
    path = os.path.join(os.path.dirname(bench_mod.__file__),
                        "PRUNING_MATRIX.json")
    with open(path, "w") as f:
        json.dump({"weights": "synthetic", "cells": cells}, f)
    err = _gate_stderr(bench_mod, capsys, prune=5, ctl="pos")
    assert "+0.0200" in err and "quality-degraded" in err
    err = _gate_stderr(bench_mod, capsys, prune=5, ctl="sentiment")
    assert "no cell" in err and "sequential/sentiment/prune5+ctlrank " in err
    # the off-switch re-measures the r4 cosine-ranked program and gates
    # on the unsuffixed ctl cell
    try:
        bench_mod.STAGE1_CTL = "off"
        err = _gate_stderr(bench_mod, capsys, prune=5, ctl="pos")
        assert "+0.9000" in err
    finally:
        bench_mod.STAGE1_CTL = "auto"


@pytest.mark.parametrize("name,val", [
    ("CONZIC_BENCH_STAGE1", "factorised"),
    ("CONZIC_BENCH_CTL", "sentimnet"),
    ("CONZIC_BENCH_TOPK_MODE", "aprox"),
    ("CONZIC_BENCH_QUANT", "int4"),
])
def test_env_knob_typos_fail_fast(name, val):
    """Typo'd CONZIC_BENCH_* values must abort before any measurement:
    they mutate cfg post-__post_init__ (bypassing ConzicConfig.validate)
    and every consumer compares == "literal", so a typo would silently
    bench a DIFFERENT tier under the requested label — the vacuous-
    measurement failure mode (cf. the r2 int8 no-op bench)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("CONZIC_BENCH_")}
    env[name] = val
    r = subprocess.run(
        [sys.executable, "-c", "import bench"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert name in (r.stderr + r.stdout)


def test_vs_baseline_basis_states_the_extrapolation(bench_mod):
    """The vs_baseline ratio is an extrapolation and must never print
    bare (VERDICT r4 item 8): a measured basis states positions/spread,
    a pre-r5 cache without one still gets the method sentence."""
    basis = {"batch": 1, "positions_measured": 4, "positions_total": 150,
             "per_position_spread_pct": 7.5}
    s = bench_mod.describe_baseline_basis(basis, vs=27683.0)
    assert "extrapolated from 4 of 150 positions" in s
    assert "spread 7.5%" in s and "drift" in s
    # pre-r5 cache (no basis recorded) still carries the method
    s = bench_mod.describe_baseline_basis(None, vs=27683.0)
    assert "extrapolated" in s and "unrecorded" in s
    # no baseline at all -> no basis line
    assert bench_mod.describe_baseline_basis(None, vs=None) is None
