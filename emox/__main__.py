import sys

from emox.cli import main

sys.exit(main())
