package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `SparkSessionExtensions` installer exposing the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql(...)` users get the same
  * codegen'd kernels the DataFrame API uses — no UDF wrapper, full
  * whole-stage-codegen participation:
  *
  *   - `graft_cosine_similarity(vec, vec)` / `graft_dot_product(vec, vec)`
  *   - `graft_simhash(array<bigint>)` — 64-bit SimHash over token hashes
  *   - `graft_chargram_md5(text, k)` — k-char-gram rolling md5 fingerprints
  *   - `graft_winnowing_minima(array<string>, w)` — winnowing window minima
  *     over gram hashes (the output of `graft_chargram_md5`)
  *   - `graft_avro_encode(struct, schemaJson)` / `graft_avro_decode(bytes,
  *     schemaJson)` — schema-registry payload codec through Tungsten
  *   - `graft_frequent_items(term, capacity)` — Misra-Gries heavy-hitters
  *     aggregate (bounded-memory top terms; exact below capacity)
  *
  * Wire-up is the standard public mechanism:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` — the
  * latter is what a 100TB cluster's shared SQL gateway would set, making
  * the dedup/ANN primitives available to plain-SQL pipelines.
  * `GraftSession.builder` installs it by default.
  *
  * Static arguments (gram size, window, Avro schema) must be literals —
  * they parameterize codegen itself, so a non-literal is rejected at
  * analysis time with a clear message rather than failing at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litString(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], usage: String)
              (builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, null, name, usage, ""),
        builder))

    inject("graft_cosine_similarity", classOf[CosineSimilarity],
      "graft_cosine_similarity(a, b) - cosine similarity of two float/double arrays") { args =>
      arity("graft_cosine_similarity", 2, args); CosineSimilarity(args(0), args(1))
    }
    inject("graft_dot_product", classOf[DotProduct],
      "graft_dot_product(a, b) - dot product of two float/double arrays") { args =>
      arity("graft_dot_product", 2, args); DotProduct(args(0), args(1))
    }
    inject("graft_dot_product_int", classOf[DotProductInt],
      "graft_dot_product_int(a, b) - exact integer dot product of two " +
        "integral arrays (the int8-quantized similarity scorer)") { args =>
      arity("graft_dot_product_int", 2, args); DotProductInt(args(0), args(1))
    }
    inject("graft_levenshtein_within", classOf[LevenshteinWithin],
      "graft_levenshtein_within(a, b, k) - Levenshtein distance if <= k " +
        "else -1 (banded DP with common prefix/suffix stripping; k must " +
        "be an integer literal)") { args =>
      arity("graft_levenshtein_within", 3, args)
      LevenshteinWithin(args(0), args(1),
        litInt("graft_levenshtein_within", "k", args(2)))
    }
    inject("graft_simhash", classOf[SimhashBits],
      "graft_simhash(hashes) - 64-bit SimHash over an array of token hashes") { args =>
      arity("graft_simhash", 1, args); SimhashBits(args(0))
    }
    inject("graft_simhash_packed", classOf[SimhashPacked],
      "graft_simhash_packed(hashes) - 64-bit SimHash as a packed long") { args =>
      arity("graft_simhash_packed", 1, args); SimhashPacked(args(0))
    }
    inject("graft_chargram_md5", classOf[CharGramMd5],
      "graft_chargram_md5(text, k) - md5 hash per k-char gram of text") { args =>
      arity("graft_chargram_md5", 2, args)
      CharGramMd5(args(0), litInt("graft_chargram_md5", "k", args(1)))
    }
    inject("graft_winnowing_minima", classOf[WinnowingMinima],
      "graft_winnowing_minima(hashes, w) - distinct minima of every w-window") { args =>
      arity("graft_winnowing_minima", 2, args)
      WinnowingMinima(args(0), litInt("graft_winnowing_minima", "w", args(1)))
    }
    inject("graft_minhash_minima", classOf[MinhashMinima],
      "graft_minhash_minima(shingles, numHashes) - MinHash signature via one md5 " +
        "per shingle + Kirsch-Mitzenmacher double hashing (array<bigint>)") { args =>
      arity("graft_minhash_minima", 2, args)
      MinhashMinima(args(0), litInt("graft_minhash_minima", "numHashes", args(1)))
    }
    inject("graft_sorted_intersect_count", classOf[SortedIntersectCount],
      "graft_sorted_intersect_count(a, b) - intersection count of two " +
        "ascending-sorted array<bigint> via a zero-allocation merge walk " +
        "(the set-similarity verify kernel)") { args =>
      arity("graft_sorted_intersect_count", 2, args)
      SortedIntersectCount(args(0), args(1))
    }
    inject("graft_srp_bucket", classOf[SignBits],
      "graft_srp_bucket(vec, dim, planes) - signed-random-projection LSH bucket " +
        "(sign bits of the vector's dot products with `planes` deterministic hyperplanes)") { args =>
      arity("graft_srp_bucket", 3, args)
      // same derived-weights expression the DataFrame surface uses
      // (Similarity.srpBucket), so SQL and DataFrame pipelines land vectors
      // in IDENTICAL buckets — the property a shared bucketed layout needs
      graft.llm.Similarity.srpBucketExpr(args(0),
        litInt("graft_srp_bucket", "dim", args(1)),
        litInt("graft_srp_bucket", "planes", args(2)))
    }
    inject("graft_frequent_items", classOf[FrequentItems],
      "graft_frequent_items(term, capacity) - Misra-Gries heavy-hitters " +
        "aggregate: array<struct<term,count>>, exact while distinct terms " +
        "< 2*capacity, undercount bounded by N/(capacity+1) otherwise") { args =>
      arity("graft_frequent_items", 2, args)
      // the analyzer wraps a bare AggregateFunction into its
      // AggregateExpression, same as built-in registry entries
      FrequentItems(args(0), litInt("graft_frequent_items", "capacity", args(1)))
    }
    inject("graft_avro_encode", classOf[AvroEncode],
      "graft_avro_encode(struct, schemaJson) - Avro-binary encode a struct") { args =>
      arity("graft_avro_encode", 2, args)
      AvroEncode(args(0), litString("graft_avro_encode", "schemaJson", args(1)))
    }
    inject("graft_avro_decode", classOf[AvroDecode],
      "graft_avro_decode(bytes, schemaJson) - decode Avro binary to a struct") { args =>
      arity("graft_avro_decode", 2, args)
      AvroDecode(args(0), litString("graft_avro_decode", "schemaJson", args(1)))
    }
  }
}
