package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Training-sequence packing: fill fixed token-budget sequences with
  * document chunks — the step between chunking and the trainer, where
  * short chunks are concatenated so no padding tokens are wasted.
  *
  * Exact greedy packing is inherently order-dependent, so the operator
  * makes the order part of the contract: chunks are sharded by
  * `doc_id % shards` and packed WITHIN a shard in (doc_id, chunk_no)
  * order — first-fit-in-order: a chunk whose tokens would overflow the
  * budget closes the current sequence and starts the next. Deterministic
  * on any cluster (the per-shard scan is sequential; shards are
  * independent tasks), so the whole operator is differentially testable —
  * the DuckDB oracle re-runs the same fold as a recursive CTE.
  *
  * Scale shape: one shuffle on the shard key
  * (`repartition(shards, shard)`), an external (spillable) per-partition
  * sort on (shard, doc_id, chunk_no), then a single streaming pass
  * (`mapPartitions`) that folds the sorted iterator and flushes on shard
  * change. Shard count is the parallelism knob: at 100 TB use
  * O(total_chunks / 10^6) shards so each task streams a bounded run.
  * Memory per task really is one open sequence (the StringBuilder of the
  * sequence being filled), not the shard — the sort is Spark's external
  * sort and the fold never materializes the iterator.
  */
object Packing {

  final case class ChunkRow(shard: Long, doc_id: Long, chunk_no: Int, n_tokens: Int)
  final case class PackedSeq(
      shard: Long, seq_no: Long, n_chunks: Long, n_tokens: Long, chunks: String)

  /** Pack (docId, chunkNo, nTokens) rows into sequences of at most
    * `budget` tokens per shard. A single chunk larger than the budget
    * still gets a (single-chunk, overflowing) sequence — dropping data
    * silently is the packer's cardinal sin; the caller filters oversized
    * chunks out beforehand if that is the policy. */
  def packSequences(chunks: DataFrame, docId: String, chunkNo: String,
      nTokens: String, shards: Int, budget: Int): Dataset[PackedSeq] = {
    require(shards > 0 && budget > 0, s"need shards>0 budget>0, got $shards/$budget")
    val ds = chunks.select(
        pmod(col(docId).cast("long"), lit(shards.toLong)).as("shard"),
        col(docId).cast("long").as("doc_id"),
        col(chunkNo).cast("int").as("chunk_no"),
        col(nTokens).cast("int").as("n_tokens"))
      .as(Encoders.product[ChunkRow])
    ds.repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"), col("chunk_no"))
      .mapPartitions { it =>
        // Streaming fold over the externally-sorted partition: several
        // shards may hash into one partition, but each shard's rows are
        // contiguous, so a shard-change flush keeps per-shard seq_no
        // semantics identical to the per-group fold this replaces.
        var curShard = Long.MinValue
        var seqNo = 0L; var nChunks = 0L; var tok = 0L
        val members = new StringBuilder
        var pending: PackedSeq = null
        def flush(): Unit = if (nChunks > 0) {
          pending = PackedSeq(curShard, seqNo, nChunks, tok, members.result())
          seqNo += 1; nChunks = 0; tok = 0; members.clear()
        }
        val folded = new Iterator[PackedSeq] {
          def hasNext: Boolean = {
            while (pending == null && it.hasNext) {
              val c = it.next()
              if (c.shard != curShard) { flush(); curShard = c.shard; seqNo = 0L }
              else if (nChunks > 0 && tok + c.n_tokens > budget) flush()
              if (nChunks > 0) members.append(',')
              members.append(c.doc_id).append(':').append(c.chunk_no)
              nChunks += 1; tok += c.n_tokens
            }
            if (pending == null && !it.hasNext) flush()
            pending != null
          }
          def next(): PackedSeq = {
            if (!hasNext) throw new NoSuchElementException("packSequences fold")
            val r = pending; pending = null; r
          }
        }
        folded
      }(Encoders.product[PackedSeq])
  }
}
