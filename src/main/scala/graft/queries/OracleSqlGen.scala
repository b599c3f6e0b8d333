package graft.queries

/** DuckDB oracle SQL for the Spark-native FAST-tier hash arms and the
  * Porter census — generated, single-statement, engine-portable.
  *
  * The fast tiers exist because their Spark kernels (the rolling k-gram
  * polynomial, codegen'd xxHash64, the native Porter Expression) beat the
  * md5-portable tiers by large factors; what they compute is still a pure
  * integer function of the input, so an oracle can REPLAY them exactly in
  * DuckDB SQL with mod-2^64 arithmetic over HUGEINT:
  *
  *  - products with one factor < 2^64 and one < 2^63.9 would overflow the
  *    signed-128 HUGEINT, so [[m64]] splits the variable factor into
  *    32-bit halves — `(x·y) mod 2^64 = (x_lo·y + ((x_hi·(y mod 2^32))
  *    mod 2^32)·2^32) mod 2^64`;
  *  - rotations decompose into disjoint bit ranges, so
  *    `rotl(x,r) = (x·2^r mod 2^64) + (x ÷ 2^(64−r))`;
  *  - xor casts through UBIGINT (exact for values < 2^64);
  *  - a `list_transform([e], v -> f(v))[1]` let-binding keeps each
  *    subexpression evaluated once, so the generated text stays linear in
  *    the formula instead of exponential in its nesting.
  *
  * Every generated statement is a SINGLE SELECT (no CREATE MACRO), so any
  * harness that can run one oracle query can run these. Inputs are the
  * ASCII test corpus (codepoint = UTF-8 byte = UTF-16 unit); the xxHash64
  * chain NULLs loudly on a ≥ 32-byte token rather than silently hashing a
  * domain the small-input path doesn't cover.
  */
private[queries] object OracleSqlGen {

  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private var ctr = 0
  /** Let-binding: evaluate `e` once, use it several times in `f`. */
  private def let(e: String)(f: String => String): String = synchronized {
    ctr += 1
    val v = s"_v$ctr"
    s"list_transform([$e], $v -> (${f(v)}))[1]"
  }

  private def rotl(x: String, r: Int): String =
    let(x)(v => s"(($v * ${BigInt(2).pow(r)}::HUGEINT) % $M + " +
      s"($v // ${BigInt(2).pow(64 - r)}::HUGEINT))")

  private def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** (a · y) mod 2^64 for a variable a < 2^64 and a LITERAL y < 2^64. */
  private def m64(a: String, yLit: String): String = {
    val y = BigInt(yLit.takeWhile(_.isDigit))
    val yLo = y % (BigInt(1) << 32)
    let(a)(v => s"(($v % 4294967296) * $yLit + (((($v // 4294967296) * " +
      s"$yLo::HUGEINT) % 4294967296) * 4294967296)) % $M")
  }

  // ── q147: rolling k-gram polynomial + murmur fmix64 ──────────────────
  // Replays graft.functions.Expressions.kgramRollingHashes (k = 8,
  // B = FNV prime 2^40+435 — small enough that Horner needs no split)
  // and the winnowing window-min selection, gram-per-row with the fmix64
  // pipeline as cascaded CTE columns.

  val q147Sql: String = {
    val sig = s"CAST(CASE WHEN a >= 9223372036854775808::HUGEINT " +
      s"THEN a - $M ELSE a END AS BIGINT)"
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
       |  FROM documents),
       |h0 AS (
       |  SELECT doc_id, i, list_reduce(
       |    [CAST(unicode(substr(text, CAST(i + j AS INT), 1)) AS HUGEINT)
       |     for j in range(0, 8)],
       |    (a, c) -> (a * 1099511628211::HUGEINT + c) % $M) AS a
       |  FROM pos),
       |f1 AS (SELECT doc_id, i, ${xor64("a", "a // 8589934592::HUGEINT")} AS a FROM h0),
       |f2 AS (SELECT doc_id, i, ${m64("a", "18397679294719823053::HUGEINT")} AS a FROM f1),
       |f3 AS (SELECT doc_id, i, ${xor64("a", "a // 8589934592::HUGEINT")} AS a FROM f2),
       |f4 AS (SELECT doc_id, i, ${m64("a", "14181476777654086739::HUGEINT")} AS a FROM f3),
       |f5 AS (SELECT doc_id, i, ${xor64("a", "a // 8589934592::HUGEINT")} AS a FROM f4),
       |sg AS (SELECT doc_id, i, $sig AS s FROM f5),
       |arr AS (SELECT doc_id, list(s ORDER BY i) AS h FROM sg GROUP BY doc_id),
       |wins AS (
       |  SELECT doc_id,
       |    [list_min(h[j:j+3]) for j in range(1, greatest(len(h) - 3, 1) + 1)] AS w
       |  FROM arr)
       |SELECT doc_id, unnest(list_sort(list_distinct(w))) AS fp
       |FROM wins ORDER BY doc_id, fp""".stripMargin
  }

  // ── q145: xxHash64 (XXH64, Collet 2012 — Spark's codegen'd hash) ─────
  // Small-input path (n < 32): 8-byte little-endian words, the 4-byte
  // chunk, trailing bytes, avalanche — exactly XXH64's spec order, which
  // is what Spark's XxHash64 computes; multi-arg chaining makes each
  // row's seed the hash of "cms<r>" at seed 42, replayed by the same
  // chain. Tokens here are ≤ 8 bytes; a ≥ 32-byte token would need the
  // stripe path and NULLs loudly instead of hashing wrong.

  /** CTE chain hashing `scol` of `src` with HUGEINT `seedExpr` → `hh`. */
  private def xxhChain(prefix: String, src: String, scol: String,
                       seedExpr: String, keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    def rnd0(x: String) = m64(rotl(m64(x, P2), 31), P1)
    def step8(a: String, x: String) =
      s"(${m64(rotl(xor64(a, rnd0(x)), 27), P1)} + $P4) % $M"
    def stepB(a: String, c: String) =
      m64(rotl(xor64(a, s"(($c) * $P5) % $M"), 11), P1)
    val w4 = s"((cs[8*(n//8) + 1] + cs[8*(n//8) + 2] * 256 + " +
      s"cs[8*(n//8) + 3] * 65536 + cs[8*(n//8) + 4] * 16777216) * $P1) % $M"
    s"""${prefix}c0 AS (
       |  SELECT $k, length($scol) AS n,
       |    [CAST(unicode(substr($scol, p, 1)) AS HUGEINT)
       |     for p in range(1, length($scol) + 1)] AS cs,
       |    $seedExpr AS sd
       |  FROM $src),
       |${prefix}c1 AS (SELECT $k, n, cs,
       |  CASE WHEN n >= 32 THEN NULL
       |    ELSE (sd + $P5 + CAST(n AS HUGEINT)) % $M END AS h FROM ${prefix}c0),
       |${prefix}c2 AS (SELECT $k, n, cs, list_reduce(list_prepend(h,
       |    [cs[8*w + 1] + cs[8*w + 2] * 256 + cs[8*w + 3] * 65536
       |     + cs[8*w + 4] * 16777216 + cs[8*w + 5] * 4294967296
       |     + cs[8*w + 6] * 1099511627776 + cs[8*w + 7] * 281474976710656
       |     + cs[8*w + 8] * 72057594037927936
       |     for w in range(0, n // 8)]),
       |    (a, x) -> ${step8("a", "x")}) AS h FROM ${prefix}c1),
       |${prefix}c3 AS (SELECT $k, n, cs,
       |  CASE WHEN n % 8 >= 4 THEN
       |    (${m64(rotl(xor64("h", w4), 23), P2)} + $P3) % $M
       |  ELSE h END AS h FROM ${prefix}c2),
       |${prefix}c4 AS (SELECT $k, list_reduce(list_prepend(h,
       |    cs[8*(n//8) + (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + 1 : n]),
       |    (a, c) -> ${stepB("a", "c")}) AS h FROM ${prefix}c3),
       |${prefix}c5 AS (SELECT $k, ${m64(xor64("h", "h // 8589934592::HUGEINT"), P2)} AS h FROM ${prefix}c4),
       |${prefix}c6 AS (SELECT $k, ${m64(xor64("h", "h // 536870912::HUGEINT"), P3)} AS h FROM ${prefix}c5),
       |${prefix}c7 AS (SELECT $k, ${xor64("h", "h // 4294967296::HUGEINT")} AS hh FROM ${prefix}c6)""".stripMargin
  }

  val q145Sql: String = {
    val seedChain = xxhChain("s", "seedsrc", "s", "42::HUGEINT", Seq("r"))
    val tokChain = xxhChain("t", "toksrc", "t", "sd0", Seq("t", "r"))
    s"""WITH aug AS (
       |  SELECT doc_id, text || ' uniq' || doc_id || ' uniq' || doc_id AS page
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(trim(lower(page)), '\\s+'), x -> x <> '')) AS t
       |  FROM aug),
       |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
       |seedsrc AS (SELECT r, 'cms' || r AS s FROM rows_),
       |$seedChain,
       |seeds AS (SELECT r, hh AS sd0 FROM sc7),
       |dist AS (SELECT DISTINCT t FROM toks),
       |toksrc AS (SELECT dist.t, seeds.r, seeds.sd0 FROM dist CROSS JOIN seeds),
       |$tokChain,
       |cells AS (SELECT t, r,
       |  ((CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
       |      THEN hh - $M ELSE hh END AS BIGINT) % 1024) + 1024) % 1024 AS c
       |  FROM tc7),
       |sketch AS (
       |  SELECT cl.r, cl.c, count(*)::BIGINT AS cnt
       |  FROM toks JOIN cells cl ON toks.t = cl.t
       |  GROUP BY 1, 2),
       |estc AS (
       |  SELECT p.t, min(coalesce(s.cnt, 0))::BIGINT AS est
       |  FROM cells p LEFT JOIN sketch s ON p.r = s.r AND p.c = s.c
       |  GROUP BY 1),
       |sc_ AS (
       |  SELECT toks.doc_id, count(*)::BIGINT AS n_tokens,
       |    sum(CASE WHEN estc.est <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare
       |  FROM toks JOIN estc ON toks.t = estc.t
       |  GROUP BY 1)
       |SELECT d.doc_id, coalesce(sc_.n_tokens, 0) AS n_tokens,
       |  coalesce(sc_.n_rare, 0) AS n_rare,
       |  round(CASE WHEN coalesce(sc_.n_tokens, 0) = 0 THEN 0
       |    ELSE sc_.n_rare::DOUBLE / sc_.n_tokens END, 6) AS novelty
       |FROM documents d LEFT JOIN sc_ USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ── q166: the Porter 1980 stemmer as a CTE step chain ────────────────
  // Replays graft.functions.Porter rule for rule over the DISTINCT token
  // set: the c/v form builds with one list_reduce (y's class depends on
  // its predecessor's), measure m = count of 'v+c+' runs, and each paper
  // step is one CTE whose CASE arms mirror the Scala longest-first
  // tables. PorterSpec's ~80 canonical vectors pass through this SQL
  // verbatim (checked when the oracle was built).

  /** Porter c/v classification string of expr `e`. */
  private def cv(e: String): String =
    s"list_reduce(list_prepend('', [substr($e, p, 1) " +
      s"for p in range(1, length($e) + 1)]), " +
      "(acc, ch) -> acc || (CASE WHEN ch IN ('a','e','i','o','u') THEN 'v' " +
      "WHEN ch = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' " +
      "THEN 'c' ELSE 'v' END) ELSE 'c' END))"
  private def meas(e: String): String =
    s"len(regexp_extract_all(${cv(e)}, 'v+c+'))"
  private def hasV(e: String): String = s"(${cv(e)} LIKE '%v%')"
  private def dblC(e: String): String =
    s"(length($e) >= 2 AND right($e, 1) = substr($e, length($e) - 1, 1) " +
      s"AND right(${cv(e)}, 1) = 'c')"
  private def cvc(e: String): String =
    s"(length($e) >= 3 AND right(${cv(e)}, 3) = 'cvc' " +
      s"AND right($e, 1) NOT IN ('w','x','y'))"
  private def drop(e: String, k: Int): String =
    s"substr($e, 1, length($e) - $k)"

  private val Step2 = Seq("ational" -> "ate", "ization" -> "ize",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "biliti" -> "ble", "tional" -> "tion", "ation" -> "ate",
    "entli" -> "ent", "ousli" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "alism" -> "al", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
    "alli" -> "al", "ator" -> "ate", "eli" -> "e")
  private val Step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
    "iciti" -> "ic", "ical" -> "ic", "ness" -> "", "ful" -> "")
  private val Step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al",
    "er", "ic", "ou")

  /** First matching suffix wins; replace only when the m-condition holds
    * (a failed condition still consumes the match — paper semantics). */
  private def ruleCase(w: String, rules: Seq[(String, String)],
                       step4: Boolean): String = {
    val arms = rules.map { case (suf, rep) =>
      val st = drop(w, suf.length)
      val body =
        if (step4) {
          val cond =
            if (suf == "ion")
              s"(${meas(st)} > 1 AND length($st) >= 1 AND " +
                s"right($st, 1) IN ('s','t'))"
            else s"(${meas(st)} > 1)"
          s"CASE WHEN $cond THEN $st ELSE $w END"
        } else
          s"CASE WHEN ${meas(st)} > 0 THEN $st || '$rep' ELSE $w END"
      s"WHEN $w LIKE '%$suf' THEN ($body)"
    }
    s"CASE ${arms.mkString(" ")} ELSE $w END"
  }

  val q166Sql: String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(
       |    regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')) AS t
       |  FROM documents),
       |dt AS (SELECT DISTINCT t FROM toks),
       |el AS (SELECT t, (length(t) >= 3 AND regexp_matches(t, '^[a-z]+$$')) AS ok FROM dt),
       |s1a AS (SELECT t, ok, CASE WHEN NOT ok THEN t
       |    WHEN t LIKE '%sses' THEN ${drop("t", 2)}
       |    WHEN t LIKE '%ies' THEN ${drop("t", 2)}
       |    WHEN t NOT LIKE '%ss' AND t LIKE '%s' THEN ${drop("t", 1)}
       |    ELSE t END AS w FROM el),
       |s1b0 AS (SELECT t, ok,
       |  CASE WHEN NOT ok THEN w
       |    WHEN w LIKE '%eed' THEN (CASE WHEN ${meas(drop("w", 3))} > 0 THEN ${drop("w", 1)} ELSE w END)
       |    WHEN w LIKE '%ed' AND ${hasV(drop("w", 2))} THEN ${drop("w", 2)}
       |    WHEN w LIKE '%ing' AND ${hasV(drop("w", 3))} THEN ${drop("w", 3)}
       |    ELSE w END AS w,
       |  (ok AND ((w LIKE '%ed' AND w NOT LIKE '%eed' AND ${hasV(drop("w", 2))})
       |       OR (w LIKE '%ing' AND ${hasV(drop("w", 3))}))) AS cleanup
       |  FROM s1a),
       |s1b AS (SELECT t, ok, CASE WHEN NOT cleanup THEN w
       |    WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz' THEN w || 'e'
       |    WHEN ${dblC("w")} AND right(w, 1) NOT IN ('l','s','z') THEN ${drop("w", 1)}
       |    WHEN ${meas("w")} = 1 AND ${cvc("w")} THEN w || 'e'
       |    ELSE w END AS w FROM s1b0),
       |s1c AS (SELECT t, ok, CASE WHEN ok AND w LIKE '%y' AND ${hasV(drop("w", 1))}
       |    THEN ${drop("w", 1)} || 'i' ELSE w END AS w FROM s1b),
       |s2 AS (SELECT t, ok, CASE WHEN NOT ok THEN w ELSE (${ruleCase("w", Step2, step4 = false)}) END AS w FROM s1c),
       |s3 AS (SELECT t, ok, CASE WHEN NOT ok THEN w ELSE (${ruleCase("w", Step3, step4 = false)}) END AS w FROM s2),
       |s4 AS (SELECT t, ok, CASE WHEN NOT ok THEN w ELSE (${ruleCase("w", Step4.map(_ -> ""), step4 = true)}) END AS w FROM s3),
       |s5a AS (SELECT t, ok, CASE WHEN ok AND w LIKE '%e' AND
       |      (${meas(drop("w", 1))} > 1 OR (${meas(drop("w", 1))} = 1 AND NOT ${cvc(drop("w", 1))}))
       |    THEN ${drop("w", 1)} ELSE w END AS w FROM s4),
       |s5b AS (SELECT t, CASE WHEN ok AND ${dblC("w")} AND right(w, 1) = 'l' AND ${meas("w")} > 1
       |    THEN ${drop("w", 1)} ELSE w END AS stem FROM s5a)
       |SELECT s5b.stem, count(*)::BIGINT AS n
       |FROM toks JOIN s5b ON toks.t = s5b.t
       |GROUP BY 1 ORDER BY n DESC, stem""".stripMargin
}
