"""Host-side data pipeline: scene synthesis, rectified dataset, loader."""
