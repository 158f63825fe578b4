"""`python -m tpumathlib.benchmarks` — run the full measurement harness."""

from tpumathlib.benchmarks import run_all

if __name__ == "__main__":
    run_all()
