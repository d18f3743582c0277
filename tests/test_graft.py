"""Driver entry-point contract tests: entry() compiles single-device;
dryrun_multichip runs the full sharded train step on the virtual mesh."""
import sys

import jax

sys.path.insert(0, ".")


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    logits, value = out
    assert logits.shape[-1] == 7


def test_dryrun_multichip(devices8):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
