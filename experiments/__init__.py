"""Experiment drivers (layer L3): CLI modules run via python -m experiments.<name>."""
