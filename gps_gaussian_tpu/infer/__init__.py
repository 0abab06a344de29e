"""Inference: freeview interpolation and sequence rendering."""
