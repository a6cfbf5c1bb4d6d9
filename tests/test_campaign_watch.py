"""Resume semantics of the tunnel-recovery campaign watcher.

`tools/campaign_watch.py` (VERDICT r4 weak #3) must re-fire only the
stages that have never SUCCEEDED — a stage with a failed row (rc=3
tpu_unavailable, timeout rc=None) has to be retried on the next healthy
window, while a stage with any rc==0 row is done forever.  This is what
let the 2026-08-18 window measure 5 stages and the next window resume
with exactly the other 5 (campaign_watch.log is the live trace).
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "tools_campaign_watch", os.path.join(REPO, "tools", "campaign_watch.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDoneStages:
    def test_missing_file_is_empty(self, tmp_path):
        mod = _load()
        assert mod.done_stages(str(tmp_path / "absent.jsonl")) == set()

    def test_only_rc0_rows_count(self, tmp_path):
        mod = _load()
        p = tmp_path / "r.jsonl"
        rows = [
            {"stage": "headline", "rc": 0},
            {"stage": "batch-64", "rc": 3},      # tpu_unavailable — retry
            {"stage": "joint-fused", "rc": None},  # stage timeout — retry
            {"stage": "batch-64", "rc": 0},      # later success sticks
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        assert mod.done_stages(str(p)) == {"headline", "batch-64"}

    def test_malformed_lines_skipped(self, tmp_path):
        mod = _load()
        p = tmp_path / "r.jsonl"
        p.write_text('not json\n{"stage": "duty-k8", "rc": 0}\n{broken\n')
        assert mod.done_stages(str(p)) == {"duty-k8"}
