"""Reporting: plots, LaTeX tables, publication figures."""
