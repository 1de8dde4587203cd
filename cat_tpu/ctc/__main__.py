"""python -m cat_tpu.ctc {decode,cal_logit} — reference-style task CLI."""
import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m cat_tpu.ctc {decode|cal_logit} ...")
        return
    cmd, rest = sys.argv[1], sys.argv[2:]
    if cmd == "decode":
        from cat_tpu.ctc.decode import main as m
    elif cmd == "cal_logit":
        from cat_tpu.ctc.cal_logit import main as m
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
    m(rest)


main()
