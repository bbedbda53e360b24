"""Smoke demo — the reference's demo.py (README.md:35-72) through this engine.

With polars installed it reproduces the exact README table via the expression
API; otherwise it prints the same table from the array API.
"""
import numpy as np

MEASURES = ["levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"]
NAME_A = ["phillips", "phillips", "", "", None, None]
NAME_B = ["phillips", "philips", "phillips", "", "phillips", None]


def main():
    try:
        import polars as pl

        from strsim_tpu import levenshtein, jaro, jaro_winkler, jaccard, sorensen_dice

        df = pl.DataFrame({"name_a": NAME_A, "name_b": NAME_B}).with_columns(
            levenshtein=levenshtein("name_a", "name_b"),
            jaro=jaro("name_a", "name_b"),
            jaro_winkler=jaro_winkler("name_a", "name_b"),
            jaccard=jaccard("name_a", "name_b"),
            sorensen_dice=sorensen_dice("name_a", "name_b"),
        )
        with pl.Config(ascii_tables=True):
            print(df)
        return
    except ImportError:
        pass

    import strsim_tpu as st

    out = st.compute_many(MEASURES, NAME_A, NAME_B)
    fmt = lambda v: "null" if v is None else v
    header = ["name_a", "name_b"] + MEASURES
    print(" | ".join(f"{h:>13}" for h in header))
    for i in range(len(NAME_A)):
        row = [fmt(NAME_A[i]), fmt(NAME_B[i])] + [
            "null" if np.isnan(out[m][i]) else f"{out[m][i]:.6g}" for m in MEASURES
        ]
        print(" | ".join(f"{c:>13}" for c in row))


if __name__ == "__main__":
    main()
