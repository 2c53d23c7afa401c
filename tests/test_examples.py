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
