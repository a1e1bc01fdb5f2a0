# run_tests wrapper: disables axon tunnel registration (zero egress relay serializes concurrent jax processes)
#!/bin/bash
# Serialized test runner. The axon sitecustomize dials the TPU relay from
# every python process; tests run on forced-CPU so skip that entirely by
# masking the trigger env var. NEVER run two jax processes concurrently on
# this host.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
exec python -m pytest "$@"
