#!/bin/sh
# Build ges-spark-udaf.jar (the O(K) capped-collect aggregator)
# against the installed pyspark's jars. Usage: tools/jvm/build.sh
# [out_dir]; writes <out_dir>/ges-spark-udaf.jar (default: this dir).
set -eu
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-"$HERE"}
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
CLS="$HERE/classes"
rm -rf "$CLS" && mkdir -p "$CLS" "$OUT"
javac -encoding UTF-8 -classpath "$SPARK_JARS/*" -d "$CLS" \
  "$HERE/src/ges/spark/CappedCollect.java"
jar cf "$OUT/ges-spark-udaf.jar" -C "$CLS" .
echo "$OUT/ges-spark-udaf.jar"
