"""Tiny stand-in stage for tools/hw_combo state-machine tests.

Executed via runpy.run_module(run_name="__main__") exactly like the real
measurement tools; behavior driven by env so tests can script failures.
"""

import os
import sys

print("fake stage ran argv=" + repr(sys.argv[1:]))
if os.environ.get("FAKE_STAGE_TOUCH"):
    with open(os.environ["FAKE_STAGE_TOUCH"], "a", encoding="utf-8") as f:
        f.write("x")
if os.environ.get("FAKE_STAGE_RAISE"):
    raise RuntimeError("fake stage exploded")
sys.exit(int(os.environ.get("FAKE_STAGE_RC", "0")))
