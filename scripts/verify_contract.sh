#!/usr/bin/env bash
# On-hardware 1e-6 contract check: production-config trace on the real
# TPU, compared per-ray to the host float64 engine.  Exits non-zero on
# violation.  See scripts/verify_contract.py.
set -e
cd "$(dirname "$0")/.."
python scripts/verify_contract.py --mode tpu "$@"
python scripts/verify_contract.py --mode ref "$@"
# dielectric variant: refraction chains through an n=1.5 slab into a
# forward receiver (asserts >=1 refracted-lane reception)
python scripts/verify_contract.py --mode tpu --refr "$@"
python scripts/verify_contract.py --mode ref --refr "$@"
