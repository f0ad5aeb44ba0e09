#!/usr/bin/env bash
set -euo pipefail

# Validation workflows train against the synthetic RAVDESS corpus, so the
# required dataset acknowledgements must be persisted before `ser --train`.
# Counterpart of the reference's scripts/configure_validation_dataset_consents.sh.
python -m ser_tpu configure \
  --accept-dataset-policy noncommercial \
  --accept-dataset-license cc-by-nc-sa-4.0 \
  --persist
