"""Early pytest plugin: re-exec the test run on a virtual 8-device CPU mesh.

The sandbox's TPU tunnel registers its PJRT plugin from a sitecustomize on
PYTHONPATH at interpreter startup — before pytest runs — and that cannot be
undone in-process.  Tests must instead run on the virtual 8-device CPU mesh
(the TPU-native analog of "test multi-node without a cluster", SURVEY.md §4),
so when the tunnel's site dir is on PYTHONPATH we re-exec pytest once with a
scrubbed environment.

This lives in a ``-p``-loaded plugin (see pyproject ``addopts``) rather than
conftest.py because plugin import happens *before* pytest's fd-level capture
starts; re-exec'ing from conftest.py leaves the child writing to pytest's
already-redirected capture fd and all output is lost.

Opt out (run tests on the real device) with MMER_TEST_ON_DEVICE=1.
"""

import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and not os.environ.get("MMER_TEST_ON_DEVICE")
        and not os.environ.get("_MMER_TEST_REEXEC")):
    env = dict(os.environ)
    # The tunnel sitecustomize only registers its PJRT plugin when
    # PALLAS_AXON_POOL_IPS is set; clearing it skips the relay handshake.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_MMER_TEST_REEXEC"] = "1"
    # Silence XLA:CPU AOT-cache machine-feature canonicalization warnings
    # (same-machine cache loads still compare feature strings from two
    # different detection paths and log an ERROR line per load).
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
