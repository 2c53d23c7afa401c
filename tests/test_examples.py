"""Smoke tests for the user-facing example CLIs (run as subprocesses, the
way a user invokes them). The heavyweight examples (training, multihost)
have their own dedicated tests; this covers the analysis tool."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(args, timeout=300):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )


def test_analyze_finds_immediate_win():
    # X has 3-4-5 on the bottom row; columns 2 and 6 both win on the spot
    r = run_example(
        [
            "examples/analyze.py",
            "--game", "connect_four",
            "--moves", "3 0 4 0 5 0",
            "--sims", "200",
            "--cpu",
        ]
    )
    assert r.returncode == 0, r.stderr
    assert "Q=+1.000" in r.stdout
    best = int(r.stdout.rsplit("search best move: ", 1)[1].split()[0])
    assert best in (2, 6)


def test_analyze_gumbel_prints_improved_policy():
    r = run_example(
        [
            "examples/analyze.py",
            "--game", "connect_four",
            "--engine", "gumbel",
            "--sims", "32",
            "--cpu",
        ]
    )
    assert r.returncode == 0, r.stderr
    assert "pi_imp" in r.stdout
    assert "gumbel recommendation" in r.stdout


def test_export_policy_artifact_serves_standalone(tmp_path):
    """export_model.py --kind policy: the artifact must (a) round-trip
    against the live function at export time, and (b) be servable from a
    fresh process with NO framework import, at a batch size different
    from the check batch (the batch dim is exported symbolically) —
    finding the immediate win from the must-win position."""
    out = tmp_path / "agent.bin"
    r = run_example(
        [
            "examples/export_model.py",
            "--kind", "policy",
            "--sims", "100",
            "--out", str(out),
            "--check",
            "--cpu",
        ]
    )
    assert r.returncode == 0, r.stderr
    assert "roundtrip check OK" in r.stdout

    consumer = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax import export

agent = export.deserialize(open({str(out)!r}, "rb").read())
# canonical must-win position: X (to move) has 3-4-5 on the bottom row
board = np.zeros((6, 7), np.int8)
board[0, 3:6] = 1
board[0:3, 0] = -1
batch = 3
action, counts = agent.call(np.stack([board] * batch))
print("actions", np.asarray(action).tolist())
assert all(int(a) in (2, 6) for a in np.asarray(action))
assert np.asarray(counts).shape == (batch, 7)
print("STANDALONE-OK")
"""
    r2 = subprocess.run(
        [sys.executable, "-c", consumer],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stderr
    assert "STANDALONE-OK" in r2.stdout


def test_analyze_rejects_illegal_move_sequence():
    r = run_example(
        [
            "examples/analyze.py",
            "--moves", "3 3 3 3 3 3 3",  # column 3 is full after 6 drops
            "--sims", "8",
            "--cpu",
        ]
    )
    assert r.returncode != 0
    assert "illegal move" in (r.stdout + r.stderr)
