"""Shim: the AFDB corpus downloader lives in genie2_tpu.cli.fetch_afdb
(console entry point `genie2-fetch-afdb`); this path is kept so
`python tools/fetch_afdb.py ...` keeps working."""

import sys

from genie2_tpu.cli.fetch_afdb import main

if __name__ == "__main__":
    sys.exit(main())
