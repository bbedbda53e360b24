"""Smoke demo — the reference's demo.py (README.md:35-72) through this engine.

Always runs the EXPRESSION layer (df.with_columns, the reference's entry
point): real polars when installed (exact README table rendering), otherwise
the in-repo minipl expression engine (same expressions, same engine path,
table printed by hand).
"""
MEASURES = ["levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"]
NAME_A = ["phillips", "phillips", "", "", None, None]
NAME_B = ["phillips", "philips", "phillips", "", "phillips", None]


def main():
    from strsim_tpu import levenshtein, jaro, jaro_winkler, jaccard, sorensen_dice

    try:
        import polars as pl

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

    from strsim_tpu import minipl as pl

    df = pl.DataFrame({"name_a": NAME_A, "name_b": NAME_B}).with_columns(
        levenshtein=levenshtein(pl.col("name_a"), pl.col("name_b")),
        jaro=jaro(pl.col("name_a"), pl.col("name_b")),
        jaro_winkler=jaro_winkler(pl.col("name_a"), pl.col("name_b")),
        jaccard=jaccard(pl.col("name_a"), pl.col("name_b")),
        sorensen_dice=sorensen_dice(pl.col("name_a"), pl.col("name_b")),
    )
    cols = df.columns
    data = {c: df[c].to_list() for c in cols}
    fmt = lambda v: "null" if v is None else (f"{v:.6g}" if isinstance(v, float) else v)
    print(" | ".join(f"{h:>13}" for h in cols))
    for i in range(df.height):
        print(" | ".join(f"{fmt(data[c][i]):>13}" for c in cols))


if __name__ == "__main__":
    main()
