"""The reference's own README example (README.md:62-85), run unchanged on
the Spark engine — only the import differs:

    import desbordante                  # reference
    import desbordante_spark.compat as desbordante   # this engine

Expected output (README.md:77-85, key LHS included):
    [Course Classroom] -> Professor
    [Classroom Semester] -> Professor
    ... (7 FDs)
"""

from __future__ import annotations

import desbordante_spark.compat as desbordante

TABLE = "/root/reference/examples/datasets/university_fd.csv"


def main(spark=None) -> None:
    # the facade reuses the process-wide session singleton; `spark` is
    # accepted for the examples harness but never needed explicitly
    algo = desbordante.fd.algorithms.Default()
    algo.load_data(table=(TABLE, ",", True))
    algo.execute()
    result = algo.get_fds()
    print("FDs:")
    for fd in result:
        print(fd)

    print("\nAFDs (inventory, error ≤ 0.1, Pyro-style):")
    afd = desbordante.afd.algorithms.Default()
    afd.load_data(
        table=("/root/reference/examples/datasets/inventory_afd.csv",
               ",", True)
    )
    afd.execute(error=0.1)
    for f in afd.get_fds():
        print(f)


if __name__ == "__main__":
    main()
