"""Engine state artifacts: trained models, lineage manifests, checkpoint/resume."""
