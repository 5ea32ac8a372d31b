"""Problem 3 diagnostics, triangle-quadrature variant (v2 alias).

The reference ships two near-identical analysis scripts: v1 with
segment-length quadrature (scripts/problem3_comprehensive_analysis.py) and
v2 with triangle-based quadrature (scripts/problem3_comprehensive_analysis2.py
— the quadrature-correct one, SURVEY.md S5). Here both share one driver;
this module pins the v2 behavior (``--quadrature triangle``, the driver's
default) for file-for-file parity with the reference layout.

Run: ``python -m scripts.problem3_comprehensive_analysis2``.
"""

import sys

from scripts.problem3_comprehensive_analysis import main as _main


def main(argv=None):
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    if "--quadrature" not in argv:
        argv += ["--quadrature", "triangle"]
    return _main(argv)


if __name__ == "__main__":
    main()
