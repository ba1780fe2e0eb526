"""``python -m cpc_audio_tpu.eval.abx`` — alias for the ABX CLI
(mirrors the reference's ``python cpc/eval/ABX.py`` entry,
/root/reference/cpc/eval/ABX.py:219)."""

import sys

from ..abx_cli import main

if __name__ == "__main__":
    sys.exit(main())
