"""Console-script smoke tests — mirrors ref tests/test_entrypoints.py:1-18
(`script_runner.run([name, '-h'])`) for the engine's CLI surface."""

import subprocess
import sys


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "asf_tools_spark", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_cli_help():
    r = _run("-h")
    assert r.returncode == 0
    for cmd in ("water_map", "flood_map", "calculate_hand", "make_composite"):
        assert cmd in r.stdout


def test_subcommand_help():
    for cmd in ("water_map", "flood_map", "calculate_hand", "make_composite"):
        r = _run(cmd, "-h")
        assert r.returncode == 0, cmd
        assert "usage" in r.stdout.lower()


def test_bad_subcommand_fails_cleanly():
    r = _run("bogus")
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_bench_help_contract():
    """bench.py exists at the repo root and is importable (driver contract)."""
    r = subprocess.run(
        [sys.executable, "-c", "import bench; assert callable(bench.main)"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
