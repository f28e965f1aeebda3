package graft.queries

import graft.core.{Q, Tables}
import graft.functions.GraftFunctions
import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

/** Corpus-cleansing operators: canonicalization, PII redaction, and
  * span-level (substring) dedup — the scrubbing stages that sit between
  * raw ingest and the doc-level dedup family in [[PipelineQueries]].
  *
  * The documents fixture is pre-cleaned ASCII, so the normalize/redact
  * entries DERIVE their dirty input deterministically from (text, doc_id)
  * with the IDENTICAL expression on both engines (string concat / replace
  * / upper of integer-keyed branches — all exact, locale-free ops). The
  * operator under test is the cleansing itself; the injection just makes
  * its effect observable and doc-dependent.
  *
  * Regex parity note: Spark compiles java.util.regex, DuckDB compiles RE2.
  * Every pattern here stays inside the common subset — explicit character
  * classes, literal anchors, bounded quantifiers; no `\s`/`\w` shorthands
  * (class membership differs: Java \s includes VT), no backrefs, no
  * lookaround (RE2 has none).
  */
object CleanseQueries {

  /** java/RE2-common shapes; explicit classes only (shared with the
    * composed pipeline operator). */
  private val EmailRe = graft.operators.PretrainPipeline.EmailRe
  private val PhoneRe = graft.operators.PretrainPipeline.PhoneRe

  /** Deterministic PII injection from (text, doc_id) — identical string
    * expression on both engines; see the module scaladoc. */
  private def injectPii(): org.apache.spark.sql.Column = concat(
    col("text"), lit(" Contact user"), col("doc_id").cast("string"),
    lit("@example.com"),
    when(col("doc_id") % 4 === 0, lit(" cc admin.team+x@example.org"))
      .otherwise(lit("")),
    when(col("doc_id") % 2 === 0,
      concat(lit(" or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")),
    lit(" today."))

  val all: Seq[Q] = Seq(
    // Unicode canonicalization via the codegen'd graft_normalize
    // (NFD → strip marks → NFC → casefold → ws-collapse): the key every
    // fingerprint/dedup stage should run on. Dirty input derived per doc:
    // a third gets accents (a→á), a third gets SHOUTING CASE, a third
    // passes through (and must come out byte-identical, changed=0).
    // Row-local, no shuffle until the output sort — linear at any scale.
    Q("q_text_normalize",
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'á')
        |         WHEN doc_id % 3 = 1 THEN upper(text)
        |         ELSE text END AS raw
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, raw,
        |    trim(regexp_replace(lower(strip_accents(nfc_normalize(raw))),
        |                        '\s+', ' ', 'g')) AS norm
        |  FROM d)
        |SELECT doc_id, length(norm) AS norm_len,
        |  CASE WHEN norm = raw THEN 0 ELSE 1 END AS changed,
        |  md5(norm) AS h
        |FROM n ORDER BY doc_id""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      val raw = when(col("doc_id") % 3 === 0, regexp_replace(col("text"), "a", "á"))
        .when(col("doc_id") % 3 === 1, upper(col("text")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .withColumn("norm", GraftFunctions.normalize(col("raw")))
        .select(col("doc_id"),
          length(col("norm")).cast("long").as("norm_len"),
          when(col("norm") === col("raw"), 0).otherwise(1).as("changed"),
          md5(col("norm")).as("h"))
        .orderBy("doc_id")
    },

    // PII redaction: count + scrub emails/phones with one regex pass per
    // class. Injection varies by doc (every doc one email, every 4th a
    // second, every 2nd a phone) so counts are doc-dependent and the
    // md5(redacted) hash pins replacement POSITIONS, not just counts.
    // Row-local scan work — the 100 TB plan is scan + project, no
    // exchange before the output sort.
    Q("q_text_redact",
      s"""WITH d AS (
         |  SELECT doc_id,
         |    text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |      || CASE WHEN doc_id % 4 = 0 THEN ' cc admin.team+x@example.org' ELSE '' END
         |      || CASE WHEN doc_id % 2 = 0 THEN ' or +1-555-' ||
         |              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |      || ' today.' AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(raw, '$EmailRe')) AS n_emails,
         |  len(regexp_extract_all(raw, '$PhoneRe')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
         |                     '$PhoneRe', '<PHONE>', 'g')) AS h
         |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), injectPii().as("raw"))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("raw"), lit(PhoneRe)).cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("h"))
        .orderBy("doc_id")
    },

    // Span-level dedup ([[graft.operators.SpanDedup]]): fraction of each
    // doc's 8-token/stride-4 spans that recur in ANOTHER doc. Spans ride
    // the shuffle as xxhash64 keys; "≥2 distinct docs" is min≠max over an
    // unordered span-key window (no count-distinct, no self-join). The
    // oracle keys on raw span text — equality with the hashed plan is the
    // fixture-level collision-freedom proof (CleanseSpec re-asserts it
    // structurally).
    Q("q_dedup_span",
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |spans AS (
        |  SELECT doc_id, array_to_string(t[p : p+7], ' ') AS span
        |  FROM toks, UNNEST(range(1, len(t) - 6, 4)) AS u(p)
        |  WHERE len(t) >= 8),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN MIN(doc_id) OVER (PARTITION BY span)
        |           <> MAX(doc_id) OVER (PARTITION BY span)
        |         THEN 1 ELSE 0 END AS is_dup
        |  FROM spans),
        |per_doc AS (
        |  SELECT doc_id, COUNT(*) AS n_spans,
        |         CAST(SUM(is_dup) AS BIGINT) AS dup_spans
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, n_spans, dup_spans,
        |       CAST(dup_spans AS DOUBLE) / n_spans AS dup_frac
        |FROM per_doc WHERE dup_spans > 0
        |ORDER BY dup_frac DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      SpanDedup.coverage(Tables.documents(s, d), w = 8, stride = 4)
        .orderBy(col("dup_frac").desc, col("doc_id"))
        .limit(100)
    },

    // URL canonicalization + duplicate grouping — the web-corpus dedup
    // stage that runs BEFORE content dedup (the same page crawled as
    // http://Site.COM:80/x?b=2&a=1#frag and http://site.com/x?a=1&b=2
    // must collapse). Policy, applied as pure string/regex algebra both
    // engines share: strip fragment; lowercase scheme and host; strip
    // default ports :80/:443; strip trailing path slashes; sort query
    // params. Messy URLs derive deterministically from doc_id: 4 variant
    // shapes over a 13-host × 7-path space keyed by doc_id div 4 — so
    // variant-0/1 crawls of one page collapse into one canonical group,
    // and same-page groups also merge across the 91-key space; both
    // engines build identical inputs. Output is
    // the DUP groups only (keeper = min doc). Scale: row-local
    // projection + one groupBy(canon) — the same shape as exact dedup;
    // regexes stay in the Java/RE2 common subset (module scaladoc).
    Q("q_url_normalize",
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTP://Site' || CAST((doc_id // 4) % 13 AS VARCHAR)
        |        || '.COM:80/docs/' || CAST((doc_id // 4) % 7 AS VARCHAR)
        |        || '?b=2&a=1#frag'
        |      WHEN 1 THEN 'http://site' || CAST((doc_id // 4) % 13 AS VARCHAR)
        |        || '.com/docs/' || CAST((doc_id // 4) % 7 AS VARCHAR) || '?a=1&b=2'
        |      WHEN 2 THEN 'HTTPS://Site' || CAST((doc_id // 4) % 13 AS VARCHAR)
        |        || '.COM:443/docs/' || CAST((doc_id // 4) % 7 AS VARCHAR)
        |        || '/?a=1&b=2'
        |      ELSE 'https://site' || CAST((doc_id // 4) % 13 AS VARCHAR)
        |        || '.com/docs/' || CAST((doc_id // 4) % 7 AS VARCHAR) || '/'
        |    END AS url
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme,
        |    regexp_replace(nf, '^[A-Za-z]+://', '') AS rest
        |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM d)),
        |r AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(regexp_extract(rest, '^([^/?]+)', 1),
        |                         ':(80|443)$', '')) AS host,
        |    substring(rest,
        |      length(regexp_extract(rest, '^([^/?]+)', 1)) + 1) AS pathq
        |  FROM q),
        |c AS (
        |  SELECT doc_id, scheme, host,
        |    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
        |                   '/+$', '') AS path,
        |    array_to_string(list_sort(string_split(
        |      regexp_extract(pathq, '[?](.*)$', 1), '&')), '&') AS sq
        |  FROM r),
        |n AS (
        |  SELECT doc_id, scheme || '://' || host || path ||
        |    CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon
        |  FROM c)
        |SELECT canon, COUNT(*) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper,
        |  CAST(SUM(doc_id) AS BIGINT) AS doc_sum
        |FROM n GROUP BY canon HAVING COUNT(*) > 1
        |ORDER BY canon""".stripMargin) { (s, d) =>
      import graft.operators.UrlCanon
      Tables.documents(s, d)
        .select(col("doc_id"),
          UrlCanon.canonical(UrlCanon.messyFromDocId(col("doc_id")))
            .as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).cast("long").as("keeper"),
          sum(col("doc_id")).cast("long").as("doc_sum"))
        .where(col("n_docs") > 1)
        .orderBy("canon")
    },

    // The composed corpus run ([[graft.operators.PretrainPipeline]]):
    // PII-injected fixture → cleanse (redact THEN normalize — the
    // idempotence-preserving order) → span-dup drop → quality floor,
    // reported as a per-stage retention funnel in one lazy frame.
    // CleanseSpec gates idempotence, redaction completeness, funnel
    // monotonicity, and the span-drop ground truth.
    Q.cap("cap_pipeline_pretrain") { (s, d) =>
      graft.operators.PretrainPipeline.retention(
        Tables.documents(s, d).withColumn("text", injectPii()))
    }
  )
}
