"""JAX platform pinning that survives this image's sitecustomize.

The container's ``sitecustomize`` imports jax at interpreter startup and
force-registers the axon TPU plugin, which snapshots jax's config before
user code runs — so exporting ``JAX_PLATFORMS=cpu`` into a subprocess
environment is silently ignored.  The live config update *is* honored as
long as no jax operation has executed yet (the backend initializes
lazily at the first op).

Every CLI driver (train.py / eval.py / run.py) and the multi-chip dryrun
call :func:`honor_platform_env` before their first jax op, so
``JAX_PLATFORMS=cpu python eval.py ...`` behaves the same here as on a
stock jax install.  The reference has no analog (TF1 picks devices via
``CUDA_VISIBLE_DEVICES``); this is environment plumbing, not semantics.
"""

import os


def honor_platform_env():
    """Re-apply ``JAX_PLATFORMS`` from the environment onto live config.

    No-op when the variable is unset/empty.  Safe to call repeatedly;
    must be called before the first jax operation in the process.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if not platforms:
        return
    import jax

    jax.config.update("jax_platforms", platforms)


def force_cpu_mesh(n_devices):
    """Pin this process to ``n_devices`` virtual CPU XLA devices.

    Appends ``--xla_force_host_platform_device_count`` to ``XLA_FLAGS``
    (env append is honored because the CPU client initializes lazily)
    and pins the platform via live config update (the env-var route is
    dead in this image, see module docstring).  Must run before the
    first jax operation.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    want = "--xla_force_host_platform_device_count=%d" % n_devices
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    n = jax.device_count()
    if n < n_devices:
        raise RuntimeError(
            "requested %d virtual CPU devices but jax reports %d — a jax "
            "operation ran before force_cpu_mesh()" % (n_devices, n)
        )
