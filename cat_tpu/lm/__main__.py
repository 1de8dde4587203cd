"""python -m cat_tpu.lm {ppl,rescore} — reference-style task CLI."""
import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m cat_tpu.lm {ppl|rescore} ...")
        return
    cmd, rest = sys.argv[1], sys.argv[2:]
    if cmd == "ppl":
        from cat_tpu.lm.ppl import main as m
    elif cmd == "rescore":
        from cat_tpu.lm.rescore import main as m
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
    m(rest)


main()
