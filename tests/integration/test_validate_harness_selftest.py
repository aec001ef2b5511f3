"""The real-checkpoint validation harness must EXECUTE end-to-end in CI
(VERDICT r3 item 6: a backstop that has never fired is no backstop).

scripts/validate_real_checkpoints.py --selftest generates synthetic
fairseq-keyed .pt files at tiny dims for every model family (via
checkpoint/fairseq_export.py, the same exporters the converter round-trip
tests prove exact) and runs ALL eight family checks with structural
assertions. This pins the harness's loading / conversion-routing / wiring /
report plumbing, so weights day only tests numerics. Already caught two real
harness bugs on first execution (fbank_jax called without its required
max_frames kwarg in the conformer_shaw and pretssel checks; the standalone
conformer forward defaulting to production dims)."""

import importlib.util
import json
import os
import sys


def _load_harness():
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, "scripts", "validate_real_checkpoints.py")
    spec = importlib.util.spec_from_file_location("validate_real_checkpoints",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_harness_selftest_all_families(tmp_path):
    import warnings

    mod = _load_harness()
    report = tmp_path / "report.json"
    with warnings.catch_warnings():
        # weights-day reports must be clean: a NaN-divide / empty-slice
        # warning inside any family check fails the selftest outright
        warnings.simplefilter("error", RuntimeWarning)
        rc = mod.main(["--checkpoint-dir", str(tmp_path / "ckpts"),
                       "--selftest", "--report", str(report)])
    assert rc == 0
    results = json.loads(report.read_text())
    assert len(results) == len(mod.CHECKS) == 8
    bad = {k: v for k, v in results.items() if v["status"] != "PASS"}
    assert not bad, f"non-PASS families: {bad}"
