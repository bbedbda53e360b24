"""Extract the reference's golden test corpus (data, not code) into JSON.

Source: /root/reference/src/expressions/strsim.rs:347-1535 — `#[test]` fns calling
`<kernel>.test("a", "b", expected)`. We map the enclosing test fn name to the
measure and emit tests/golden/<measure>.json as [[a, b, expected], ...].
"""
import json, re, pathlib

src = pathlib.Path("/root/reference/src/expressions/strsim.rs").read_text()
tests = src[src.index("#[cfg(test)]"):]

fn_re = re.compile(r"fn (\w+)\(\)")
case_re = re.compile(r'\.test\("((?:[^"\\]|\\.)*)", "((?:[^"\\]|\\.)*)", ([0-9.]+)\);')

measure_of = {
    "levenshtein": "levenshtein", "jaro_winkler": "jaro_winkler", "jaro": "jaro",
    "jaccard": "jaccard", "sorensen_dice": "sorensen_dice",
}

corpus = {}
cur = None
for line in tests.splitlines():
    m = fn_re.search(line)
    if m:
        name = m.group(1)
        cur = None
        for prefix, measure in measure_of.items():
            if name.startswith(prefix + "_"):
                # jaro_ prefix must not swallow jaro_winkler_
                if prefix == "jaro" and name.startswith("jaro_winkler"):
                    continue
                cur = measure
                break
        continue
    m = case_re.search(line)
    if m and cur:
        a, b, exp = m.group(1), m.group(2), float(m.group(3))
        assert "\\" not in a and "\\" not in b, (a, b)
        corpus.setdefault(cur, []).append([a, b, exp])

out = pathlib.Path("/root/repo/tests/golden")
total = 0
for measure, cases in sorted(corpus.items()):
    (out / f"{measure}.json").write_text(json.dumps(cases, indent=1))
    print(measure, len(cases))
    total += len(cases)
print("total", total)
