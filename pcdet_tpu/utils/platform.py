"""Backend selection for the CLIs.

The CLIs default to whatever backend jax picks (on a TPU host, the TPU).
`PCDET_PLATFORM=cpu` forces a platform — the supported way to run the
train/test CLIs on a machine without an accelerator (or when the
accelerator is unreachable): plain `JAX_PLATFORMS=cpu` in the shell does
NOT work on hosts whose sitecustomize registers an accelerator backend
before the CLI runs, so this must be applied in-process, before jax
initializes (same mechanism as tests/conftest.py).

`PCDET_HOST_DEVICES=N` additionally splits the CPU into N virtual devices
(XLA host-platform device count) so the multi-chip data-mesh path of the
CLIs can be exercised without N real chips.
"""
import os


def apply_platform_env():
    """Honor PCDET_PLATFORM / PCDET_HOST_DEVICES.  Must run before any jax
    computation; safe to call multiple times."""
    plat = os.environ.get('PCDET_PLATFORM', '')
    ndev = os.environ.get('PCDET_HOST_DEVICES', '')
    if ndev:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + ' --xla_force_host_platform_device_count=%d' % int(ndev))
    if plat:
        os.environ['JAX_PLATFORMS'] = plat
        import jax
        try:
            jax.config.update('jax_platforms', plat)
        except Exception:
            pass
