"""Hyperparameter optimization (optuna-compatible in-repo engine)."""

from airpollution_tpu.hpo.search import Study, TPESampler, Trial, create_study

__all__ = ["Study", "TPESampler", "Trial", "create_study"]
