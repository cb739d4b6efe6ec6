"""Baseline models for the parity/eval harness: Restormer (trained in the
reference), SwinIR / DRUNet / DnCNN (eval-comparison models)."""
