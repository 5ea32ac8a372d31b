"""Hyperparameter optimization (optuna-compatible in-repo engine)."""

from airpollution_tpu.hpo.search import Study, Trial, create_study

__all__ = ["Study", "Trial", "create_study"]
