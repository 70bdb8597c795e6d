"""Session-robustness gate: the driver priority window must be correct
under a VANILLA SparkSession (ANSI on, static partition-overwrite, no
OLAP_CONF) — see tests/_vanilla_driver.py for why this is a subprocess.
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_priority_window_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-m", "tests._vanilla_driver"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, (
        "vanilla-session gate failed:\n"
        + "\n".join(
            ln for ln in proc.stdout.splitlines() if "VANILLA" in ln
        )[:4000]
        + proc.stderr[-2000:]
    )
