import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
print("devices:", jax.device_count())
import __graft_entry__ as ge
ge.dryrun_multichip(8)
print("dryrun_multichip(8) OK")
fn, args = ge.entry()
print("entry forward:", jax.jit(fn)(*args).shape)
