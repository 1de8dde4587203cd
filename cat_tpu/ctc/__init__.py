"""CTC / CTC-CRF acoustic model task."""
