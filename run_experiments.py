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

print("Running PINN experiments...")
subprocess.run([sys.executable, "-m", "experiments.pinn_experiments",
                "--width=4", f"--epochs={epochs}", "--activation=tanh"])

print("Running CRBE experiments...")
subprocess.run([sys.executable, "-m", "experiments.crbe_experiments"])

print("Running sensitivity analysis...")
subprocess.run([sys.executable, "-m", "experiments.sensitivity_analysis",
                "--width=4", f"--epochs={epochs}", "--activation=tanh"])

print("Running fixed runtime experiments...")
subprocess.run([sys.executable, "-m", "experiments.fixed_runtime_experiments",
                "--run_for_testing=True"])

print("Generating visualizations...")
subprocess.run([sys.executable, "-m", "airpollution_tpu.reporting.data_visualization"])

print("Generating LaTeX tables...")
subprocess.run([sys.executable, "-m", "airpollution_tpu.reporting.table_generator"])

print("\nAll experiments completed!")
print("Results saved in experimental_results/")
