"""spark-submit entry script (north_rule: "run via spark-submit --py-files").

Usage:
    cd /root/repo && zip -qr /tmp/ethos_spark.zip ethos_spark
    spark-submit --master local[8] --py-files /tmp/ethos_spark.zip \
        scripts/submit_crawl.py crawl --warehouse /tmp/wh --corpus /tmp/corpus \
        --seeds https://news-0.example.org/list/1

The script only imports from the shipped zip — it proves the package is
self-contained for cluster submission (no repo checkout on executors).
"""

import sys

from ethos_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] if len(sys.argv) > 1 else ["--help"]))
