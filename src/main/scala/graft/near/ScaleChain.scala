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
  *    1–2 blocks later (cross-block lineage, the mainnet shape); tx
  *    action lists mix single transfers, multi-action, function calls,
  *    and delegate actions (UDTF flatten at the TX level too);
  *  - each arriving receipt's outcome produces 0–2 children (again
  *    1–2 blocks out), depth-capped at 5 — NEAR call chains are short,
  *    and the cap bounds the lineage fixpoint's iteration count;
  *  - a "whale" tx (hash `WHALE`, block 1) whose receipts branch
  *    2-wide to depth 7 — one ~500-receipt tree for the consumer
  *    receipt-tree query;
  *  - ~15% of arriving action receipts declare output data; the DATA
  *    receipt lands 1–2 blocks later (the DataId lineage path,
  *    receipts.rs:107-132, two extra lineage hops), and ~25% of later
  *    action receipts consume pending data ids as `input_data_ids`;
  *  - ~8% of blocks reuse an earlier tx hash with a fresh receipt
  *    (issue84 `_issue84_<height>` suffixing at volume);
  *  - ~10% of blocks get a same-height fork re-delivering shard 0's
  *    txs (fork dedup: same hash AND same converted receipt);
  *  - ~10% of receipts arrive as delegate actions (UDTF flatten at
  *    volume), FT/NFT/malformed event logs on ~1/2 of outcomes
  *    (per-(block,shard) ordinal windows at volume, incl. NFT
  *    double-explode over token_ids);
  *  - ~12% of arriving receipts are account-lifecycle events
  *    (CreateAccount / DeleteAccount over a two-tier pool: 14 hot
  *    accounts churned ~10× each + a ~500-account wide tier, plus
  *    implicit-account transfers) — create→delete→re-create churn AND
  *    a hundreds-wide key space for the accounts registry's last-wins
  *    fold (accounts.rs:85-198);
  *  - ~30% of arrivals emit access-key update/deletion state changes
  *    over a two-tier (account × key) space (24 hot combos + ~600
  *    wide), mixing FULL_ACCESS and FUNCTION_CALL permissions
  *    (access_keys.rs:71-146 fold at volume);
  *  - account-update state changes with tx/receipt causes, including
  *    exact duplicates (partial-unique-index dedup at volume) and
  *    occasional account_deletion changes;
  *  - six lockup accounts created/deleted/re-created at fixed blocks
  *    (feeds aggregated__lockups + the daily circulating-supply
  *    series, one state per locked-amount branch — see
  *    [[lockupStates]]);
  *  - blocks are 2h apart so daily aggregates span ~21 distinct days.
  */
object ScaleChain {

  val WhaleTx = "WHALE"
  val DefaultBlocks = 256
  val DefaultSeed = 7L

  private final case class Arrival(
      rid: String, tx: String, depth: Int, whale: Boolean, shard: Int,
      isData: Boolean = false, dataId: String = "",
      forceReceiver: String = "", forceActions: String = "")

  /** (block, lockup account index, isCreate): fund1 is deleted at 100
    * and RE-created at 200 (the registry's trickiest shape — the later
    * CREATE must null the deletion); fund3 deleted at 160 drops out of
    * the daily supply series mid-chain.
    */
  private val lockupEvents = Seq(
    (4, 0, true), (8, 1, true), (20, 2, true), (40, 3, true),
    (100, 1, false), (140, 4, true), (160, 3, false),
    (200, 1, true), (220, 5, true))

  private def implicitId(n: Int): String = ("ab" * 31) + f"$n%02d"

  def chain(seed: Long = DefaultSeed, nBlocks: Int = DefaultBlocks): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val F = Fixtures
    val scheduled = scala.collection.mutable.Map[Int, Vector[Arrival]]()
      .withDefaultValue(Vector.empty)
    val priorTx = scala.collection.mutable.ArrayBuffer[String]()
    val pendingInputs = scala.collection.mutable.Queue[String]()
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

    /** Lifecycle receipts with a pinned receiver+action (lockup account
      * create/delete); always-successful outcome, no children.
      */
    def scheduleForced(from: Int, tx: String, receiver: String,
        actions: String): String = {
      val rid = s"FR$rc"
      rc += 1
      val tgt = from + 1 + rnd.nextInt(2)
      if (tgt < nBlocks)
        scheduled(tgt) = scheduled(tgt) :+ Arrival(rid, tx, 0, whale = false,
          rnd.nextInt(2), forceReceiver = receiver, forceActions = actions)
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
        val action = rnd.nextInt(12) match {
          case 0 => F.fcall(Fixtures.b64Args)
          case 1 => F.delegate // TX-level delegate flatten at volume
          case 2 => s"${F.transfer},${F.fcall(Fixtures.b64Args)}"
          case _ => F.transfer
        }
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
      // Lockup lifecycle at fixed blocks (aggregated__lockups + the
      // daily supply series, main.rs:60-236).
      lockupEvents.filter(_._1 == i).foreach { case (_, k, create) =>
        val acct = s"fund$k.lockup.near"
        val action = if (create) F.createAccount else F.deleteAccount
        val h = s"LT${i}_$k"
        txsByShard(rnd.nextInt(2)) +=
          F.tx(h, "funder.near", acct, action, F.svOk,
            scheduleForced(i, h, acct, action))
      }

      // --- arrivals: receipts into chunks + outcomes producing children ---
      val receiptsByShard = Array.fill(2)(Vector.newBuilder[String])
      val outcomesByShard = Array.fill(2)(Vector.newBuilder[String])
      scheduled(i).foreach { a =>
        if (a.isData) {
          receiptsByShard(a.shard) += F.dataReceipt(a.rid, a.dataId,
            data = if (rnd.nextInt(4) == 0) "null" else "\"aGk=\"")
        } else {
          val forced = a.forceActions.nonEmpty
          val (receiver, actions) =
            if (forced) (a.forceReceiver, a.forceActions)
            else {
              val roll = rnd.nextInt(100)
              if (roll < 12)
                // account-lifecycle churn over a TWO-TIER pool: a hot
                // 14-account tier re-churned ~10× each (the fold must
                // keep only the LAST create/delete per account,
                // accounts.rs:85-198) plus a ~500-account wide tier so
                // the registry gates hundreds of final rows and the
                // last-wins window's partition behavior is exercised
                // across a real key space, not 26 keys
                (if (rnd.nextInt(4) == 0) s"acc${rnd.nextInt(14)}.near"
                 else s"acc${14 + rnd.nextInt(486)}.near",
                  if (rnd.nextInt(10) < 6) F.createAccount else F.deleteAccount)
              else if (roll < 16)
                // implicit account: TRANSFER to a 64-char id creates it
                (implicitId(rnd.nextInt(40)), F.transfer)
              else
                (s"user${rnd.nextInt(6)}.near",
                  if (rnd.nextInt(10) == 0) F.delegate
                  else if (rnd.nextInt(8) == 0)
                    s"${F.transfer},${F.fcall(Fixtures.b64Args)}"
                  else F.transfer)
            }
          val outputData =
            if (!forced && rnd.nextInt(100) < 15) {
              val did = s"XD$dc"; dc += 1
              val tgt = i + 1 + rnd.nextInt(2)
              if (tgt < nBlocks) {
                val drid = s"XDR$dc"
                scheduled(tgt) = scheduled(tgt) :+
                  Arrival(drid, a.tx, a.depth, a.whale, rnd.nextInt(2),
                    isData = true, dataId = did)
              }
              pendingInputs.enqueue(did)
              s"""[{"data_id":"$did","receiver_id":"sink.near"}]"""
            } else "[]"
          val inputData =
            if (!forced && pendingInputs.nonEmpty && rnd.nextInt(100) < 25) {
              val n = 1 + rnd.nextInt(math.min(2, pendingInputs.size))
              (0 until n).map(_ => pendingInputs.dequeue())
                .map(d => s""""$d"""").mkString("[", ",", "]")
            } else "[]"
          val rj = F.actionReceipt(a.rid, "app.near", receiver, "app.near",
            actions, outputData = outputData, inputData = inputData)
          receiptsByShard(a.shard) += rj
          val nKids =
            if (forced) 0
            else if (a.whale && a.depth < 7) 2
            else if (!a.whale && a.depth < 5) rnd.nextInt(3)
            else 0
          // children are produced even when scheduled past the last
          // block — tail receipts never arrive but their eor edges do.
          val produced = (0 until nKids)
            .map(_ => schedule(i, a.tx, a.depth + 1, a.whale))
          val logs = if (forced) Seq.empty else rnd.nextInt(12) match {
            case 0 | 1     => Seq(F.ftMintLog)
            case 2         => Seq(F.ftTransferLog)
            case 3         => Seq(F.nftTransferLog)
            case 4         => Seq(F.malformedEventLog, F.ftMintLog)
            case 5         => Seq(F.plainLog)
            case 6         => Seq(F.nftMintLog)
            case 7         => Seq(F.nftBurnLog, F.ftTransferLog)
            case _         => Seq.empty
          }
          val status =
            if (forced) F.svOk // lifecycle must take effect
            else if (rnd.nextInt(20) == 0) F.failed
            else F.svOk
          outcomesByShard(a.shard) += F.outcome(a.rid, s"XB$i", status,
            produced, logs, rj, executor = receiver)
          if (!forced) {
            if (rnd.nextInt(10) < 4) {
              val sc = F.scAccountUpdate(receiver, F.causeReceipt(a.rid),
                amount = (100 + rnd.nextInt(1000000)).toString)
              stateChanges += sc
              // exact duplicate → partial-unique-index dedup must drop it
              if (rnd.nextInt(20) == 0) stateChanges += sc
            }
            // access-key churn over a two-tier (account × key) space —
            // the last-wins fold at volume (access_keys.rs:71-146): a
            // hot 24-combo tier churned ~15× each plus a ~600-combo
            // wide tier (λ≈1.5 events/combo) so the registry gates
            // hundreds of distinct keys while still folding repeats
            if (rnd.nextInt(10) < 3) {
              val (acct, key) =
                if (rnd.nextInt(4) == 0)
                  (s"user${rnd.nextInt(6)}.near", s"ed25519:K${rnd.nextInt(4)}")
                else
                  (s"keyacct${rnd.nextInt(120)}.near",
                    s"ed25519:K${rnd.nextInt(5)}")
              stateChanges +=
                (if (rnd.nextInt(4) == 0)
                  F.scAccessKeyDeletion(acct, key, F.causeReceipt(a.rid))
                else F.scAccessKeyUpdate(acct, key, F.causeReceipt(a.rid),
                  permission =
                    if (rnd.nextInt(3) == 0) F.fcPermission
                    else "\"FullAccess\""))
            }
            if (rnd.nextInt(50) == 0)
              stateChanges += F.scAccountDeletion(receiver, F.causeReceipt(a.rid))
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

  /** Static lockup contract states for the six `fundN.lockup.near`
    * accounts, as the S4 RPC point source would return them — one per
    * branch of the locked-amount math (lockup.rs:104-196): plain 4-year
    * linear release; a lockup_timestamp cliff followed by a 10-day
    * release (full → decay → 0 across the chain's ~21 days); a vesting
    * schedule whose cliff and end both land mid-chain; terminated
    * vesting with withdrawn tokens; the buggy-code-hash start-date
    * branch; and a transfers+duration start with a 5-day release.
    */
  def lockupStates: Seq[Lockup.State] = {
    def base(id: String) = Lockup.State(
      accountId = id,
      codeHash = "Cw7bnyp4B6ypwvgZuMmJtY6rHsxP2D4PC8deqeJ3HP7D",
      lockupAmount = "1000000000000000000000000000000",
      terminationWithdrawnTokens = "0",
      lockupDuration = 0L,
      releaseDuration = None,
      lockupTimestamp = None,
      transfersTimestamp = Lockup.TransfersEnabledNs,
      vestingType = Lockup.VestingNone,
      vestingStart = None, vestingCliff = None, vestingEnd = None,
      terminatingUnvestedAmount = None)
    Seq(
      base("fund0.lockup.near").copy( // plain 4-year linear release
        releaseDuration = Some(126230400000000000L)),
      base("fund1.lockup.near").copy( // locked until mid-chain, then 10-day release
        lockupAmount = "2500000000000000000000000000000",
        lockupTimestamp = Some(1700600000000000000L),
        releaseDuration = Some(864000000000000L)),
      base("fund2.lockup.near").copy( // vesting schedule, cliff + end inside the chain
        vestingType = Lockup.VestingSchedule,
        vestingStart = Some(1699000000000000000L),
        vestingCliff = Some(1700900000000000000L),
        vestingEnd = Some(1701500000000000000L)),
      base("fund3.lockup.near").copy( // terminated vesting, partially withdrawn
        vestingType = Lockup.VestingTerminating,
        terminatingUnvestedAmount = Some("77000000000000000000000000"),
        terminationWithdrawnTokens = "3000000000000000000000000"),
      base("fund4.lockup.near").copy( // buggy code hash: release clock starts at transfers
        codeHash = "3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q",
        lockupTimestamp = Some(1700500000000000000L),
        releaseDuration = Some(126230400000000000L)),
      base("fund5.lockup.near").copy( // start = transfers + duration, 5-day release
        lockupDuration = 98000000000000000L,
        releaseDuration = Some(432000000000000L)))
  }
}
