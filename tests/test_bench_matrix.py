"""bench_matrix campaign runner (tools/bench_matrix.py)."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "tools_bench_matrix", os.path.join(REPO, "tools", "bench_matrix.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestBenchMatrix:
    def test_unknown_stage_rejected(self, tmp_path):
        r = subprocess.run(
            [
                sys.executable, "tools/bench_matrix.py",
                "--stages", "nonsense",
                "--out", str(tmp_path / "o.jsonl"),
            ],
            capture_output=True, text=True, timeout=60, cwd=REPO,
        )
        assert r.returncode != 0
        assert "unknown stages" in (r.stderr + r.stdout)

    def test_stage_names_unique_and_known(self):
        mod = _load()
        names = [s[0] for s in mod.STAGES]
        assert len(names) == len(set(names))
        # every stage's script exists
        for _, argv, _ in mod.STAGES:
            assert os.path.exists(os.path.join(REPO, argv[0])), argv[0]

    @pytest.mark.slow
    def test_run_stage_records_result_line(self):
        mod = _load()
        rec = mod.run_stage(
            "smoke", ["bench.py", "--quick", "--cpu"], timeout=400
        )
        assert rec["rc"] == 0, rec
        assert rec["result"]["value"] > 0
        json.dumps(rec)  # JSONL-serializable

    def test_run_stage_timeout_recorded(self):
        mod = _load()
        rec = mod.run_stage(
            "hang", ["-c", "import time; time.sleep(30)"], timeout=2
        )
        assert rec["rc"] is None
        assert "timeout" in rec["error"]
