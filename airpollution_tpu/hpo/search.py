"""In-repo hyperparameter search engine (optuna stand-in).

The reference's HPO driver uses optuna's TPE study with thread-parallel
trials (optimal_hyperparams_search.py:87-89). optuna is not available in
this environment, so this module provides the small surface the driver
needs — ``create_study`` -> ``Study.optimize`` -> ``best_trial`` /
``trials_dataframe`` — with the same trial API (``suggest_float(log=...)``,
``set_user_attr``) and the same failure semantics (a trial returning inf on
exception, optimal_hyperparams_search.py:82-84).

Sampling: random search over the declared distributions (optuna itself runs
random sampling for its first ``n_startup_trials=10`` trials — identical
behavior at the reference's default n_trials=10), with an optional
median-pruning-flavored refinement: after the startup phase, new candidates
are drawn around the current best point in log space ("localized random
search"), a cheap TPE-like exploitation step.
"""

from __future__ import annotations

import concurrent.futures
import datetime
import threading
import time
from typing import Callable, Optional

import numpy as np


class Trial:
    def __init__(self, number: int, rng: np.random.Generator,
                 best_params: Optional[dict] = None, exploit: bool = False):
        self.number = number
        self._rng = rng
        self._best_params = best_params or {}
        self._exploit = exploit
        self.params: dict = {}
        self.user_attrs: dict = {}
        self.value: Optional[float] = None
        self.state = "RUNNING"
        self.datetime_start = datetime.datetime.now()
        self.datetime_complete: Optional[datetime.datetime] = None

    def suggest_float(self, name: str, low: float, high: float,
                      log: bool = False) -> float:
        if self._exploit and name in self._best_params:
            # Localized sampling around the incumbent (log-space jitter).
            center = self._best_params[name]
            if log:
                lo, hi = np.log(low), np.log(high)
                val = np.clip(
                    np.log(center) + self._rng.normal(0, (hi - lo) / 8),
                    lo, hi,
                )
                out = float(np.exp(val))
            else:
                span = (high - low) / 8
                out = float(np.clip(
                    center + self._rng.normal(0, span), low, high
                ))
        elif log:
            out = float(np.exp(
                self._rng.uniform(np.log(low), np.log(high))
            ))
        else:
            out = float(self._rng.uniform(low, high))
        self.params[name] = out
        return out

    def suggest_int(self, name: str, low: int, high: int) -> int:
        out = int(self._rng.integers(low, high + 1))
        self.params[name] = out
        return out

    def suggest_categorical(self, name: str, choices):
        out = choices[int(self._rng.integers(0, len(choices)))]
        self.params[name] = out
        return out

    def set_user_attr(self, key: str, value):
        self.user_attrs[key] = value


class Study:
    def __init__(self, direction: str = "minimize",
                 study_name: str = "study", seed: int = 0,
                 n_startup_trials: int = 10):
        if direction not in ("minimize", "maximize"):
            raise ValueError(f"unknown direction {direction}")
        self.direction = direction
        self.study_name = study_name
        self.trials: list[Trial] = []
        self._seed = seed
        self._n_startup = n_startup_trials
        self._lock = threading.Lock()

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.direction == "minimize" else a > b

    @property
    def best_trial(self) -> Trial:
        done = [t for t in self.trials if t.state == "COMPLETE"
                and t.value is not None and np.isfinite(t.value)]
        if not done:
            raise ValueError("no completed trials")
        best = done[0]
        for t in done[1:]:
            if self._better(t.value, best.value):
                best = t
        return best

    def optimize(self, objective: Callable, n_trials: int = 10,
                 n_jobs: int = 1):
        def run_one(number: int):
            rng = np.random.default_rng(self._seed + number)
            with self._lock:
                exploit = number >= self._n_startup and any(
                    t.state == "COMPLETE" and t.value is not None
                    and np.isfinite(t.value) for t in self.trials
                )
                best_params = (
                    dict(self.best_trial.params) if exploit else None
                )
            trial = Trial(number, rng, best_params, exploit)
            try:
                value = objective(trial)
                trial.value = float(value)
                trial.state = "COMPLETE"
            except Exception as e:  # trial failure -> inf, like the driver
                print(f"Trial {number} failed: {e}")
                trial.value = float("inf")
                trial.state = "FAIL"
            trial.datetime_complete = datetime.datetime.now()
            with self._lock:
                self.trials.append(trial)

        # Continue numbering across optimize() calls (optuna semantics):
        # restarting at 0 would reuse rng streams and re-propose already
        # evaluated points.
        start = len(self.trials)
        numbers = range(start, start + n_trials)
        if n_jobs == 1:
            for i in numbers:
                run_one(i)
        else:
            with concurrent.futures.ThreadPoolExecutor(n_jobs) as pool:
                list(pool.map(run_one, numbers))

    def trials_dataframe(self):
        """optuna-compatible trials table (columns as in
        study.trials_dataframe(): number, value, datetimes, duration,
        params_*, user_attrs_*, state)."""
        import pandas as pd

        rows = []
        for t in sorted(self.trials, key=lambda t: t.number):
            row = {
                "number": t.number,
                "value": t.value,
                "datetime_start": t.datetime_start,
                "datetime_complete": t.datetime_complete,
                "duration": (t.datetime_complete - t.datetime_start)
                if t.datetime_complete else None,
            }
            for k, v in t.params.items():
                row[f"params_{k}"] = v
            for k, v in t.user_attrs.items():
                row[f"user_attrs_{k}"] = v
            row["state"] = t.state
            rows.append(row)
        return pd.DataFrame(rows)


def create_study(direction: str = "minimize", study_name: str = "study",
                 seed: int = 0) -> Study:
    return Study(direction=direction, study_name=study_name, seed=seed)
