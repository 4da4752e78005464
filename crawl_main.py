"""spark-submit entry script for the crawl pipeline.

``spark-submit`` takes a positional application FILE (there is no ``-m``
module flag), so cluster launches submit this one-liner alongside the
zipped package:

    zip -r sparkcrawl.zip sparkcrawl/
    spark-submit --master <cluster> --py-files sparkcrawl.zip \
        crawl_main.py <corpus> <store> --round-size 10000000 ...

Client-mode / local runs can use ``python -m sparkcrawl.crawl ...``
directly. Argument parsing, session wiring, and the crawl loop all live in
:func:`sparkcrawl.crawl.main` — this file exists only to be positional.
"""

from sparkcrawl.crawl import main

if __name__ == "__main__":
    main()
