package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Batched model-adapter seam (VERDICT R3 wishlist #2) — the
  * reference calls external embedding and rerank services
  * (apps/backend/internal/worker/embedder_consumer.go;
  * apps/backend/internal/retrieval/service.go:40-41 Reranker,
  * adapter/reranker/client.go). graft's oracle-checked queries use
  * deterministic in-plan stand-ins (poly_bow, token-overlap); THIS
  * is the production swap-in point: a Serializable batched interface
  * with a per-task lifecycle, applied via mapPartitions so each
  * executor task holds one client and ships `batchSize` rows per
  * request instead of one RPC per row.
  *
  * Async bindings: `embedBatch`/`scoreBatch` are synchronous per
  * batch by contract, but an implementation may pipeline internally
  * (fire request n+1 while awaiting n) because batches arrive from a
  * lazy iterator — the standard async-HTTP embedder shape. On
  * PySpark the same contract is `mapInPandas` (iterator of
  * pandas batches == this iterator of row groups).
  */
object ModelAdapters {

  /** Batched text -> vector adapter (the embedder API client seam).
    * `open()` once per task before the first batch (build the HTTP
    * client / load the local model), `embedBatch` once per
    * `batchSize` rows, `close()` once per task after the last batch.
    * Must return exactly one `dims`-length vector per input text. */
  trait Embedder extends Serializable {
    def dims: Int
    def open(): Unit = ()
    def embedBatch(texts: Seq[String]): Seq[Array[Double]]
    def close(): Unit = ()
  }

  /** Batched (query, passage) -> relevance score adapter (the
    * Jina/Cohere cross-encoder client seam). Same lifecycle contract
    * as [[Embedder]]; one score per passage. */
  trait Reranker extends Serializable {
    def open(): Unit = ()
    def scoreBatch(query: String, passages: Seq[String]): Seq[Double]
    def close(): Unit = ()
  }

  /** Deterministic stub embedder: lowercase whitespace tokens ->
    * poly_bow (the same SQL-reproducible polynomial-hash BoW the
    * in-plan `poly_bow` expression computes — ModelAdaptersSpec
    * asserts bit-equality), so swapping the adapter in or out of a
    * pipeline never changes oracle results. */
  final class PolyBowEmbedder(val dims: Int = 64) extends Embedder {
    def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.map { t =>
        val v = new Array[Double](dims)
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
          var h = 0L
          var j = 0
          while (j < tok.length) {
            h = (h * 31 + tok.charAt(j)) % 1000000007L
            j += 1
          }
          v((h % dims).toInt) += 1.0
        }
        v
      }
  }

  /** Deterministic stub reranker: token-overlap Jaccard between the
    * query and the passage — the same scorer s4_rerank's in-plan
    * expression uses. */
  final class OverlapReranker extends Reranker {
    def scoreBatch(query: String, passages: Seq[String]): Seq[Double] = {
      val q = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      passages.map { p =>
        val d = p.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
        if (d.isEmpty && q.isEmpty) 0.0
        else d.intersect(q).size.toDouble / d.union(q).size
      }
    }
  }

  /** Append `outCol` (array<double>) to `df` by running `textCol`
    * through the embedder in `batchSize` groups. One adapter
    * lifecycle per task; null/absent text embeds as the empty
    * string. The scan stays distributed — rows never leave their
    * partition, and each task's RPC count is rows/batchSize. */
  def embed(df: DataFrame, textCol: String, outCol: String,
            embedder: Embedder, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      withLifecycle(embedder.open(), embedder.close()) {
        rows.grouped(batchSize).flatMap { batch =>
          val texts = batch.map(r => if (r.isNullAt(idx)) "" else r.getString(idx))
          val vecs = embedder.embedBatch(texts)
          require(vecs.length == batch.length,
            s"embedder returned ${vecs.length} vectors for ${batch.length} texts")
          batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
        }
      }
    }(Encoders.row(schema))
  }

  /** Append `scoreCol` (double) to a candidate DataFrame by scoring
    * `textCol` against `query` in `batchSize` groups — the rerank
    * stage shape: it runs AFTER top-k candidate selection, so the
    * adapter sees k rows, not the corpus. */
  def rerank(candidates: DataFrame, textCol: String, query: String,
             scoreCol: String, reranker: Reranker,
             batchSize: Int = 64): DataFrame = {
    val schema = candidates.schema.add(scoreCol, DoubleType, nullable = false)
    val idx = candidates.schema.fieldIndex(textCol)
    candidates.mapPartitions { rows =>
      withLifecycle(reranker.open(), reranker.close()) {
        rows.grouped(batchSize).flatMap { batch =>
          val texts = batch.map(r => if (r.isNullAt(idx)) "" else r.getString(idx))
          val scores = reranker.scoreBatch(query, texts)
          require(scores.length == batch.length,
            s"reranker returned ${scores.length} scores for ${batch.length} passages")
          batch.lazyZip(scores).map((r, s) => Row.fromSeq(r.toSeq :+ s))
        }
      }
    }(Encoders.row(schema))
  }

  /** The reference reranker's EXACT contract (retrieval/service.go:40
    * Reranker interface): given (query, passages) return a
    * PERMUTATION of indices, best first — the Cohere/Jina-style
    * rerank-API response shape — as opposed to [[Reranker]]'s
    * per-passage scores. */
  trait IndexReranker extends Serializable {
    def open(): Unit = ()
    def rerank(query: String, passages: Seq[String]): Seq[Int]
    def close(): Unit = ()
  }

  /** Apply an index reranker's response the way service.go:125-132
    * does: the result has exactly `indices.length` slots, each slot i
    * holding docs(indices(i)); an out-of-range index leaves its slot
    * EMPTY (the reference writes a zero-value struct there — safe
    * from panic, asserted in its RerankerEdgeCases test — here the
    * slot is None so a caller can't mistake it for a real hit).
    * Reranking is skipped entirely when docs is empty (the reference
    * never calls the reranker then). */
  def applyRerankIndices[T](docs: Seq[T], indices: Seq[Int]): Seq[Option[T]] =
    indices.map(i => if (i >= 0 && i < docs.length) Some(docs(i)) else None)

  /** The served-search rerank step: collect-side (a serving result
    * is k small rows), reranker called once per query, skipped on
    * empty results like the reference. */
  def rerankServed(query: String, docs: Seq[org.apache.spark.sql.Row],
                   textIdx: Int, reranker: IndexReranker)
      : Seq[Option[org.apache.spark.sql.Row]] = {
    if (docs.isEmpty) Seq.empty
    else {
      reranker.open()
      try {
        val idx = reranker.rerank(query, docs.map { r =>
          if (r.isNullAt(textIdx)) "" else r.getString(textIdx)
        })
        applyRerankIndices(docs, idx)
      } finally reranker.close()
    }
  }

  /** Run `open` now and `close` after `body`'s iterator is fully
    * consumed (mapPartitions iterators are lazy — an eager close
    * would tear the client down before the first batch). */
  private def withLifecycle[T](open: => Unit, close: => Unit)
                              (body: => Iterator[T]): Iterator[T] = {
    open
    val it = body
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) close
        h
      }
      def next(): T = it.next()
    }
  }

  /** Test/diagnostic instrumentation: adapters that record their
    * batch shapes through JVM-static counters (meaningful on
    * local[*], where tasks share the JVM). */
  object Instrumented {
    val embedCalls = new AtomicLong
    val embedMaxBatch = new AtomicLong
    val opens = new AtomicLong
    val closes = new AtomicLong

    def reset(): Unit = {
      embedCalls.set(0); embedMaxBatch.set(0); opens.set(0); closes.set(0)
    }

    final class CountingEmbedder(val dims: Int = 64) extends Embedder {
      private val inner = new PolyBowEmbedder(dims)
      override def open(): Unit = opens.incrementAndGet()
      override def close(): Unit = closes.incrementAndGet()
      def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
        embedCalls.incrementAndGet()
        embedMaxBatch.getAndUpdate(m => math.max(m, texts.length))
        inner.embedBatch(texts)
      }
    }
  }
}
