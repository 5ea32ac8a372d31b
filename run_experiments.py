#!/usr/bin/env python3
"""Experiment orchestrator (parity with the reference run_experiments.py).

Runs the full pipeline in smoke-test mode — epochs=1, testing budgets — as
subprocesses, then the figure and table generators, exactly like
run_experiments.py:6-24. Data flows through the CSV files under
``experimental_results/``.
"""
import subprocess
import sys

epochs = 1
failures = []


def run(label, args):
    print(label)
    proc = subprocess.run([sys.executable, "-m", *args])
    if proc.returncode != 0:
        # The reference ignores stage failures (run_experiments.py:8-24);
        # here they are collected and reported so a broken stage cannot
        # masquerade as a green pipeline.
        failures.append((args[0], proc.returncode))


run("Running PINN experiments...",
    ["experiments.pinn_experiments", "--width=4", f"--epochs={epochs}",
     "--activation=tanh"])
run("Running CRBE experiments...", ["experiments.crbe_experiments"])
run("Running sensitivity analysis...",
    ["experiments.sensitivity_analysis", "--width=4", f"--epochs={epochs}",
     "--activation=tanh"])
run("Running fixed runtime experiments...",
    ["experiments.fixed_runtime_experiments", "--run_for_testing=True"])
run("Generating visualizations...",
    ["airpollution_tpu.reporting.data_visualization"])
run("Generating LaTeX tables...",
    ["airpollution_tpu.reporting.table_generator"])

if failures:
    print("\nFAILED stages:", failures)
    sys.exit(1)
print("\nAll experiments completed!")
print("Results saved in experimental_results/")
