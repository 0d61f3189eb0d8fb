package ges.spark;

import java.util.ArrayList;
import org.apache.spark.sql.Column;
import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;
import org.apache.spark.sql.functions;

/**
 * Capped-buffer collect: the O(K) violation-sample aggregator.
 *
 * <p>Spark's built-in collect_list has no early truncation — the
 * engine's fallback plan, slice(collect_list(when(cond, v)), 1, K),
 * bounds what a partition EMITS but the aggregation buffer still
 * accumulates every violating value in the partition
 * (plans/single_pass.py module docstring). This aggregator stops
 * accumulating at {@code cap} elements, making the in-scan state
 * O(K) per check regardless of the partition's violation rate.
 *
 * <p>Determinism: the engine applies it inside the partition-local
 * groupBy(spark_partition_id()) pass, so reduce() sees rows in
 * partition order and no cross-partition merge happens — the sample
 * is the FIRST K violations in partition order, exactly what the
 * fallback emits.
 *
 * <p>The result is a JSON array string of the collected elements
 * (each element is itself a to_json transport string, escaped here);
 * the Python side re-parses it JVM-side with from_json to
 * array&lt;string&gt;, so every downstream consumer sees the same
 * shape as the fallback path.
 */
public final class CappedCollect
    extends Aggregator<String, ArrayList<String>, String> {

  private final int cap;

  public CappedCollect(int cap) {
    this.cap = cap;
  }

  @Override
  public ArrayList<String> zero() {
    return new ArrayList<>();
  }

  @Override
  public ArrayList<String> reduce(ArrayList<String> buf, String v) {
    if (v != null && buf.size() < cap) {
      buf.add(v);
    }
    return buf;
  }

  @Override
  public ArrayList<String> merge(ArrayList<String> a, ArrayList<String> b) {
    for (String v : b) {
      if (a.size() >= cap) {
        break;
      }
      a.add(v);
    }
    return a;
  }

  @Override
  public String finish(ArrayList<String> buf) {
    StringBuilder sb = new StringBuilder(buf.size() * 32 + 2);
    sb.append('[');
    for (int i = 0; i < buf.size(); i++) {
      if (i > 0) {
        sb.append(',');
      }
      appendJsonString(sb, buf.get(i));
    }
    sb.append(']');
    return sb.toString();
  }

  private static void appendJsonString(StringBuilder sb, String s) {
    sb.append('"');
    for (int i = 0; i < s.length(); i++) {
      char c = s.charAt(i);
      switch (c) {
        case '"':
          sb.append("\\\"");
          break;
        case '\\':
          sb.append("\\\\");
          break;
        case '\n':
          sb.append("\\n");
          break;
        case '\r':
          sb.append("\\r");
          break;
        case '\t':
          sb.append("\\t");
          break;
        default:
          if (c < 0x20) {
            sb.append(String.format("\\u%04x", (int) c));
          } else {
            sb.append(c);
          }
      }
    }
    sb.append('"');
  }

  @Override
  @SuppressWarnings({"unchecked", "rawtypes"})
  public Encoder<ArrayList<String>> bufferEncoder() {
    return (Encoder) Encoders.javaSerialization(ArrayList.class);
  }

  @Override
  public Encoder<String> outputEncoder() {
    return Encoders.STRING();
  }

  /** Static entry point the Python side reaches via reflection. */
  public static Column cappedCollect(Column col, int cap) {
    return functions.udaf(new CappedCollect(cap), Encoders.STRING())
        .apply(col);
  }
}
