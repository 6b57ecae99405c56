"""The local multi-process launch harness (Vertex CustomJob analogue,
reference 04_vertex_job.py:25-58): spawn 2 real OS processes, initialize
the JAX distributed runtime against a shared coordinator, and run sharded
training steps over one global mesh spanning both processes."""

import pathlib
import subprocess
import sys

SCRIPT = pathlib.Path(__file__).resolve().parent.parent / "scripts" / \
    "launch_multiprocess.py"


def test_two_process_launch():
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--num-processes", "2",
         "--devices-per-process", "2", "--steps", "2"],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "launch_multiprocess: OK" in out.stdout
    assert "[worker 0/2] ok" in out.stdout
    assert "[worker 1/2] ok" in out.stdout
