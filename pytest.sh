#!/bin/bash
# CPU test runner that never claims the TPU tunnel (see .claude/skills/verify)
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "$@"
