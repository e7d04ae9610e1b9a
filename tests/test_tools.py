"""Tests for the operational tooling (SURVEY.md §5 tracing row).

The profiler harness (tools/profile_prover.py) is the committed form
of the instrument used to find the fused pipeline latency-bound; its
trace parsing is covered here with a synthetic chrome trace so the
fast tier never needs a TPU or a real profile run.
"""

import gzip
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _write_trace(path, events):
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


class TestProfilerSummarize:
    def test_device_lane_filter_and_grouping(self, tmp_path, capsys):
        from tools.profile_prover import summarize

        trace = tmp_path / "t.trace.json.gz"
        _write_trace(
            trace,
            [
                # lane metadata: one device lane, one python lane
                {"ph": "M", "name": "process_name", "pid": 1,
                 "args": {"name": "/device:TPU:0"}},
                {"ph": "M", "name": "process_name", "pid": 2,
                 "args": {"name": "python"}},
                # device ops: two fusion instances must group together
                {"ph": "X", "pid": 1, "tid": 0, "name": "fusion.123",
                 "ts": 0, "dur": 1000},
                {"ph": "X", "pid": 1, "tid": 0, "name": "fusion.456",
                 "ts": 1000, "dur": 3000},
                {"ph": "X", "pid": 1, "tid": 0, "name": "copy.1",
                 "ts": 4000, "dur": 500},
                # host op on the python lane: must be filtered out
                {"ph": "X", "pid": 2, "tid": 0, "name": "hostwork",
                 "ts": 0, "dur": 99999},
                # incomplete event without dur: ignored
                {"ph": "B", "pid": 1, "tid": 0, "name": "begin", "ts": 0},
            ],
        )
        total = summarize(str(trace), top=10)
        out = capsys.readouterr().out
        # 4.5 ms of device-lane ops; the 99.999 ms host op excluded
        assert abs(total - 4.5) < 1e-9
        assert "fusion" in out and "hostwork" not in out
        # fusion.* grouped: 4.0 ms over 2 ops
        fusion_line = next(
            ln for ln in out.splitlines() if ln.startswith("fusion")
        )
        assert "4.00" in fusion_line and "2" in fusion_line.split()[2]

    def test_no_device_lane_keeps_all(self, tmp_path, capsys):
        from tools.profile_prover import summarize

        trace = tmp_path / "t.trace.json.gz"
        _write_trace(
            trace,
            [
                {"ph": "M", "name": "process_name", "pid": 2,
                 "args": {"name": "python"}},
                {"ph": "X", "pid": 2, "tid": 0, "name": "op",
                 "ts": 0, "dur": 2000},
            ],
        )
        total = summarize(str(trace), top=10)
        assert abs(total - 2.0) < 1e-9

    def test_import_does_not_reexec(self):
        """Importing the tool module must not trigger the script-mode
        PYTHONHASHSEED re-exec (regression: a module-level os.execv
        silently replaced any importing process)."""
        env = dict(os.environ)
        env.pop("PYTHONHASHSEED", None)
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "import tools.profile_prover; print('IMPORT_OK')" % _REPO],
            env=env, capture_output=True, text=True, timeout=60,
        )
        assert "IMPORT_OK" in out.stdout, out.stderr
