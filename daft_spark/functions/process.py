"""Process execution — parity with the reference's
``daft/functions/process.py`` (run_process): run a command per row and
capture its output, the escape hatch for shelling out to a CLI tool
(ffprobe, pandoc, ...) inside a pipeline.

Executor-side subprocesses via an Arrow-batched pandas UDF — the
standard pattern for per-row external tools; concurrency is bounded by
task slots, so a 1000-executor cluster runs 1000*cores processes at
most, never a driver-side fork storm.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

RUN_SCHEMA = "struct<stdout: string, stderr: string, returncode: int>"


def run_process(cmd, timeout=None, shell=False) -> Column:
    """Execute ``cmd`` (a string column: argv joined by spaces, or a
    full shell line with shell=True) once per row; returns
    struct(stdout, stderr, returncode). Rows with null commands yield
    null. A timeout kills the process and reports returncode -1."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(RUN_SCHEMA)
    def _run(s: pd.Series) -> pd.DataFrame:
        import shlex
        import subprocess

        out = []
        for c in s:
            if c is None:
                out.append({"stdout": None, "stderr": None, "returncode": None})
                continue
            argv = c if shell else shlex.split(c)
            try:
                p = subprocess.run(
                    argv, shell=shell, capture_output=True, text=True, timeout=timeout
                )
                out.append(
                    {"stdout": p.stdout, "stderr": p.stderr, "returncode": p.returncode}
                )
            except subprocess.TimeoutExpired as e:
                out.append(
                    {
                        "stdout": e.stdout.decode() if isinstance(e.stdout, bytes) else e.stdout,
                        "stderr": f"timeout after {timeout}s",
                        "returncode": -1,
                    }
                )
            except OSError as e:
                out.append({"stdout": None, "stderr": str(e), "returncode": -1})
        return pd.DataFrame(out)

    return _run(F.col(cmd) if isinstance(cmd, str) else cmd)
