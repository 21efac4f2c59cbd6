"""The driver's multi-chip gate must stay green.

Round-1 regression: ``dryrun_multichip`` touched jax devices without pinning
the CPU platform, so the driver's run initialized this environment's TPU
plugin and died on a libtpu mismatch (MULTICHIP_r01.json ok=false). The entry
point now runs its body in a platform-hermetic subprocess; this test executes
that exact path (including from a process whose jax backend is already
initialized, as the driver's may be).
"""

import sys

sys.path.insert(0, ".")


def test_dryrun_multichip_is_platform_hermetic():
    import jax

    jax.devices()  # ensure the calling process has an initialized backend

    import __graft_entry__ as g

    g.dryrun_multichip(4)  # raises on subprocess failure
