"""Probe: run every html.suite input through our parser, report outcome."""
import json, sys
sys.path.insert(0, "/root/repo")
from nreadspark.dom import build_document, serialize_node


def parse_suite(path):
    cases, args, input_lines, expected_lines, current = [], None, [], [], None
    with open(path, encoding="utf-8-sig") as f:
        for line in f:
            if line.startswith("`"):
                if current is None or current == "expected":
                    if current == "expected":
                        cases.append((args, "".join(input_lines), "".join(expected_lines)))
                    args = line[1:].strip()
                    input_lines, expected_lines = [], []
                    current = "input"
                else:
                    current = "expected"
                continue
            (input_lines if current == "input" else expected_lines).append(line)
    if current == "expected":
        cases.append((args, "".join(input_lines), "".join(expected_lines)))
    return cases


cases = parse_suite("/root/repo/tests/fixtures/sgml_suite/html.suite")
print("cases:", len(cases))
out = []
for i, (args, inp, exp) in enumerate(cases):
    try:
        doc = build_document(inp)
        ser = serialize_node(doc.root) if doc.root is not None else ""
        out.append({"i": i, "args": args, "ok": True, "ser": ser})
    except Exception as e:
        out.append({"i": i, "args": args, "ok": False, "err": f"{type(e).__name__}: {e}"})
for r in out:
    if not r["ok"]:
        print("CRASH", r["i"], r["args"], r["err"])
    else:
        print(f"{r['i']:3d} [{r['args']:20s}] {r['ser'][:110]!r}")
json.dump(out, open("/root/repo/scratch/sgml_probe.json", "w"), indent=1)
