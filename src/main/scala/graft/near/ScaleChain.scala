package graft.near

/** Deterministic 256-block synthetic chain for the VOLUME correctness
  * gate: the hand fixture ([[Fixtures.chain]]) exercises every quirk on
  * 4 blocks; this chain exercises the same semantics at thousands of
  * rows so the independent DuckDB oracle becomes load-bearing for
  * volume-dependent behavior (window tie-breaks, ordinal numbering,
  * fork dedup rank, issue84 suffixing, lineage over long DAGs —
  * `database/src/adapters/receipts.rs:159-482`,
  * `transactions.rs:43-89`).
  *
  * Seeded `scala.util.Random` only (Java LCG — identical sequence on
  * every JVM), so the Spark side and the parquet the oracle reads are
  * bit-stable across runs. Shapes mixed in, all at volume:
  *
  *  - 1–4 txs/block over two shards, converting to receipts that land
  *    1–2 blocks later (cross-block lineage, the mainnet shape);
  *  - each arriving receipt's outcome produces 0–2 children (again
  *    1–2 blocks out), depth-capped at 5 — NEAR call chains are short,
  *    and the cap bounds the lineage fixpoint's iteration count;
  *  - a "whale" tx (hash `WHALE`, block 1) whose receipts branch
  *    2-wide to depth 7 — one ~500-receipt tree for the consumer
  *    receipt-tree query;
  *  - ~15% of arriving action receipts declare output data; the DATA
  *    receipt lands 1–2 blocks later (the DataId lineage path,
  *    receipts.rs:107-132, two extra lineage hops);
  *  - ~8% of blocks reuse an earlier tx hash with a fresh receipt
  *    (issue84 `_issue84_<height>` suffixing at volume);
  *  - ~10% of blocks get a same-height fork re-delivering shard 0's
  *    txs (fork dedup: same hash AND same converted receipt);
  *  - ~10% of receipts arrive as delegate actions (UDTF flatten at
  *    volume), FT/NFT/malformed event logs on ~1/3 of outcomes
  *    (per-(block,shard) ordinal windows at volume);
  *  - account-update state changes with tx/receipt causes, including
  *    exact duplicates (partial-unique-index dedup at volume);
  *  - blocks are 2h apart so daily aggregates span ~21 distinct days.
  */
object ScaleChain {

  val WhaleTx = "WHALE"
  val DefaultBlocks = 256
  val DefaultSeed = 7L

  private final case class Arrival(
      rid: String, tx: String, depth: Int, whale: Boolean, shard: Int,
      isData: Boolean = false, dataId: String = "")

  def chain(seed: Long = DefaultSeed, nBlocks: Int = DefaultBlocks): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val F = Fixtures
    val scheduled = scala.collection.mutable.Map[Int, Vector[Arrival]]()
      .withDefaultValue(Vector.empty)
    val priorTx = scala.collection.mutable.ArrayBuffer[String]()
    var rc = 0
    var dc = 0

    def schedule(from: Int, tx: String, depth: Int, whale: Boolean): String = {
      val rid = if (whale) s"WR$rc" else s"XR$rc"
      rc += 1
      val tgt = from + 1 + rnd.nextInt(2)
      if (tgt < nBlocks)
        scheduled(tgt) = scheduled(tgt) :+
          Arrival(rid, tx, depth, whale, rnd.nextInt(2))
      rid
    }

    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (i <- 0 until nBlocks) {
      val height = 5000L + i
      val ts = (1700000000000000000L + i * 7200000000000L).toString
      val stateChanges = scala.collection.mutable.ArrayBuffer[String]()

      // --- transactions (split over two shards) ---
      val nTx = 1 + rnd.nextInt(4)
      val txsByShard = Array.fill(2)(Vector.newBuilder[String])
      for (j <- 0 until nTx) {
        val h = s"XT${i}_$j"
        val signer = s"user${rnd.nextInt(6)}.near"
        priorTx += h
        val action =
          if (rnd.nextInt(10) == 0) F.fcall(Fixtures.b64Args) else F.transfer
        txsByShard(rnd.nextInt(2)) +=
          F.tx(h, signer, "app.near", action, F.svOk, schedule(i, h, 0, whale = false))
        if (rnd.nextInt(10) < 3)
          stateChanges += F.scAccountUpdate(signer, F.causeTx(h),
            amount = (100 + rnd.nextInt(1000000)).toString)
      }
      if (i == 1)
        txsByShard(0) += F.tx(WhaleTx, "whale.near", "app.near", F.transfer,
          F.svOk, schedule(i, WhaleTx, 0, whale = true))
      // issue84: reuse an earlier hash with a FRESH receipt — surfaces
      // as `<hash>_issue84_<height>`, and the receipt's whole subtree
      // resolves to the suffixed hash on both engine and oracle.
      if (i >= 3 && rnd.nextInt(100) < 8) {
        val h = priorTx(rnd.nextInt(priorTx.length - nTx)) // strictly earlier block
        txsByShard(rnd.nextInt(2)) += F.tx(h, "mallory.near", "app.near",
          F.transfer, F.svOk, schedule(i, s"${h}_issue84_$height", 0, whale = false))
      }

      // --- arrivals: receipts into chunks + outcomes producing children ---
      val receiptsByShard = Array.fill(2)(Vector.newBuilder[String])
      val outcomesByShard = Array.fill(2)(Vector.newBuilder[String])
      scheduled(i).foreach { a =>
        if (a.isData) {
          receiptsByShard(a.shard) += F.dataReceipt(a.rid, a.dataId,
            data = if (rnd.nextInt(4) == 0) "null" else "\"aGk=\"")
        } else {
          val actions =
            if (rnd.nextInt(10) == 0) F.delegate
            else if (rnd.nextInt(8) == 0) s"${F.transfer},${F.fcall(Fixtures.b64Args)}"
            else F.transfer
          val outputData =
            if (rnd.nextInt(100) < 15) {
              val did = s"XD$dc"; dc += 1
              val tgt = i + 1 + rnd.nextInt(2)
              if (tgt < nBlocks) {
                val drid = s"XDR$dc"
                scheduled(tgt) = scheduled(tgt) :+
                  Arrival(drid, a.tx, a.depth, a.whale, rnd.nextInt(2),
                    isData = true, dataId = did)
              }
              s"""[{"data_id":"$did","receiver_id":"sink.near"}]"""
            } else "[]"
          val receiver = s"user${rnd.nextInt(6)}.near"
          val rj = F.actionReceipt(a.rid, "app.near", receiver, "app.near",
            actions, outputData = outputData)
          receiptsByShard(a.shard) += rj
          val nKids =
            if (a.whale && a.depth < 7) 2
            else if (!a.whale && a.depth < 5) rnd.nextInt(3)
            else 0
          // children are produced even when scheduled past the last
          // block — tail receipts never arrive but their eor edges do.
          val produced = (0 until nKids)
            .map(_ => schedule(i, a.tx, a.depth + 1, a.whale))
          val logs = rnd.nextInt(12) match {
            case 0 | 1     => Seq(F.ftMintLog)
            case 2         => Seq(F.ftTransferLog)
            case 3         => Seq(F.nftTransferLog)
            case 4         => Seq(F.malformedEventLog, F.ftMintLog)
            case 5         => Seq(F.plainLog)
            case _         => Seq.empty
          }
          outcomesByShard(a.shard) += F.outcome(a.rid, s"XB$i",
            if (rnd.nextInt(20) == 0) F.failed else F.svOk,
            produced, logs, rj, executor = receiver)
          if (rnd.nextInt(10) < 4) {
            val sc = F.scAccountUpdate(receiver, F.causeReceipt(a.rid),
              amount = (100 + rnd.nextInt(1000000)).toString)
            stateChanges += sc
            // exact duplicate → partial-unique-index dedup must drop it
            if (rnd.nextInt(20) == 0) stateChanges += sc
          }
        }
      }

      val shards = (0 until 2).map { s =>
        F.shard(s, Some(F.chunk(s"XC${i}_$s", s,
            txsByShard(s).result(), receiptsByShard(s).result())),
          outcomesByShard(s).result(),
          if (s == 0) stateChanges.toSeq else Seq.empty)
      }
      out += F.block(height, s"XB$i", if (i == 0) "XBG" else s"XB${i - 1}",
        ts, shards)
      // same-height fork re-delivering shard 0's txs (same hash AND
      // same converted receipt ⇒ fork dedup, never an issue84 suffix)
      val shard0Txs = txsByShard(0).result()
      if (shard0Txs.nonEmpty && rnd.nextInt(100) < 10)
        out += F.block(height, s"XB${i}F", if (i == 0) "XBG" else s"XB${i - 1}",
          ts, Seq(F.shard(0, Some(F.chunk(s"XC${i}F_0", 0, shard0Txs, Seq.empty)),
            Seq.empty, Seq.empty)))
    }
    out.toSeq
  }
}
