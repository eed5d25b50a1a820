package graft.near

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, StringType}

/** The per-block transform DAG (SURVEY §2.2): NormBlock rows → the 17
  * relational tables of `database/src/schema.rs`. Every function is a
  * pure DataFrame→DataFrame map — no driver loops, no state; the only
  * stateful operator (receipt lineage, §2.4) lives in Lineage.scala.
  *
  * Input: the DataFrame of Dataset[NormBlock] (Ingest.blocks). Ordinals
  * always derive from posexplode positions or explicit parser indexes —
  * never monotonically_increasing_id (SURVEY §7.6#4).
  */
object Transforms {

  private val D20 = DecimalType(20, 0)
  private val D38 = DecimalType(38, 0)

  /** CHECKED numeric cast (SURVEY §7.6#1): under default ANSI-off, a
    * value exceeding the target precision casts to NULL silently —
    * which downstream coalesce/agg would quietly absorb as 0. The
    * reference's `numeric(45,0)` DDL (initial_schema/up.sql:163) cannot
    * overflow on u128; DECIMAL(38,0) can (> ~1e38), so overflow (or a
    * malformed numeric string) must fail the job loudly instead of
    * corrupting balances. The error branch is codegen-lazy — the hot
    * path pays one null-check per value.
    */
  private[graft] def checkedCast(c: Column, t: DecimalType): Column = {
    val casted = c.cast(t)
    when(c.isNotNull && casted.isNull,
      raise_error(concat(lit(s"value does not fit $t: "), c.cast(StringType))))
      .otherwise(casted).cast(t)
  }

  private def d20(c: Column): Column = checkedCast(c, D20)
  private[graft] def d38(c: Column): Column = checkedCast(c, D38)

  /** blocks (schema.rs:174-186). */
  def blocks(norm: DataFrame): DataFrame =
    norm.select(
      d20(col("blockHeight")).as("block_height"),
      col("blockHash").as("block_hash"),
      col("prevBlockHash").as("prev_block_hash"),
      d20(col("blockTimestamp")).as("block_timestamp"),
      d38(col("totalSupply")).as("total_supply"),
      d38(col("gasPrice")).as("gas_price"),
      col("author").as("author_account_id"))

  /** chunks (schema.rs:188-200); chunk missing from a shard is already
    * filtered by the parser (chunks.rs:18 filter_map).
    */
  def chunks(norm: DataFrame): DataFrame =
    norm.select(col("blockHash"), explode(col("chunks")).as("c"))
      .select(
        col("blockHash").as("included_in_block_hash"),
        col("c.chunkHash").as("chunk_hash"),
        d20(col("c.shardId")).as("shard_id"),
        col("c.signature").as("signature"),
        d20(col("c.gasLimit")).as("gas_limit"),
        d20(col("c.gasUsed")).as("gas_used"),
        col("c.author").as("author_account_id"))

  /** Deterministic PK dedup (the parquet-side analogue of the
    * reference's `ON CONFLICT DO NOTHING` PKs, SURVEY §4 "Dedup via
    * wide PKs"): keep the first row per key under `order`. Same-height
    * forks deliver the same receipt/outcome/event in both branches;
    * exactly one survives, chosen stably so replays agree.
    */
  def dedupPk(df: DataFrame, pk: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pk: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exploded transactions with block/chunk context and the issue84
    * collision handling (transactions.rs:43-89). The reference's
    * discriminator is `converted_into_receipt_id`: a same-hash row
    * with the SAME converted receipt is a fork duplicate (PK dedup,
    * silently dropped); a same-hash row with a DIFFERENT converted
    * receipt is a genuine collision and gets `_issue84_<height>`.
    */
  def transactionsBase(norm: DataFrame): DataFrame = {
    val ex = norm.select(
        col("blockHash"), col("blockHeight"), col("blockTimestamp"),
        posexplode(col("chunks")).as(Seq("chunkPos", "c")))
      .select(col("blockHash"), col("blockHeight"), col("blockTimestamp"),
        col("chunkPos"), col("c.chunkHash").as("chunkHash"),
        explode(col("c.transactions")).as("t"))
    val order = Seq(col("blockHeight").cast("long"), col("chunkPos"),
      col("t.indexInChunk"), col("blockHash"))
    val forkDeduped = dedupPk(ex,
      Seq(col("t.transactionHash"), col("t.convertedIntoReceiptId")), order)
    val w = Window.partitionBy(col("t.transactionHash")).orderBy(order: _*)
    forkDeduped.withColumn("dupRank", row_number().over(w))
      .withColumn("transaction_hash",
        when(col("dupRank") === 1, col("t.transactionHash"))
          .otherwise(concat(col("t.transactionHash"), lit("_issue84_"),
            col("blockHeight"))))
  }

  /** transactions (schema.rs:271-291). */
  def transactions(txBase: DataFrame): DataFrame =
    txBase.select(
      col("transaction_hash"),
      col("blockHash").as("included_in_block_hash"),
      col("chunkHash").as("included_in_chunk_hash"),
      col("t.indexInChunk").as("index_in_chunk"),
      d20(col("blockTimestamp")).as("block_timestamp"),
      col("t.signerAccountId").as("signer_account_id"),
      col("t.signerPublicKey").as("signer_public_key"),
      d20(col("t.nonce")).as("nonce"),
      col("t.receiverAccountId").as("receiver_account_id"),
      col("t.signature").as("signature"),
      col("t.status").as("status"),
      col("t.convertedIntoReceiptId").as("converted_into_receipt_id"),
      d20(col("t.receiptConversionGasBurnt")).as("receipt_conversion_gas_burnt"),
      d38(col("t.receiptConversionTokensBurnt")).as("receipt_conversion_tokens_burnt"))

  /** Delegate-aware action flattening (transactions.rs:196-264 /
    * receipts.rs:534-625): each Delegate action expands to a parent row
    * plus one row per inner action; the running index spans the
    * flattened sequence. Pure relational form — the running base index
    * is a windowed prefix sum of (1 + inner_count), so no UDTF.
    *
    * `df` must contain `actions` (array of NormAction) plus key/context
    * columns; returns keys + (index, action_kind, args,
    * is_delegate_action, delegate_parameters, parent_index).
    */
  def flattenActions(df: DataFrame, keys: Seq[String]): DataFrame = {
    val ex = df.select(keys.map(col) :+
      posexplode(col("actions")).as(Seq("p", "a")): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val based = ex.withColumn("base",
      coalesce(sum(lit(1) + coalesce(size(col("a.inner")), lit(0))).over(w),
        lit(0)).cast("int"))
    val parents = based.select(keys.map(col) ++ Seq(
      col("base").as("index"),
      col("a.kind").as("action_kind"),
      col("a.args").as("args"),
      col("a.delegateParameters").isNotNull.as("is_delegate_action"),
      col("a.delegateParameters").as("delegate_parameters"),
      lit(null).cast("int").as("parent_index")): _*)
    val children = based
      .filter(col("a.inner").isNotNull && size(col("a.inner")) > 0)
      .select(keys.map(col) ++ Seq(col("base"),
        col("a.delegateParameters").as("dp"),
        posexplode(col("a.inner")).as(Seq("q", "ia"))): _*)
      .select(keys.map(col) ++ Seq(
        (col("base") + lit(1) + col("q")).cast("int").as("index"),
        col("ia.kind").as("action_kind"),
        col("ia.args").as("args"),
        lit(true).as("is_delegate_action"),
        col("dp").as("delegate_parameters"),
        col("base").as("parent_index")): _*)
    parents.unionByName(children)
  }

  /** transaction_actions (schema.rs:256-269). */
  def transactionActions(txBase: DataFrame): DataFrame =
    flattenActions(
      txBase.select(col("transaction_hash"), col("t.actions").as("actions")),
      Seq("transaction_hash"))
      .select(
        col("transaction_hash"),
        col("index").as("index_in_transaction"),
        col("action_kind"), col("args"), col("is_delegate_action"),
        col("delegate_parameters"),
        col("parent_index").as("delegate_parent_index_in_transaction"))

  /** Exploded chunk receipts with block/chunk context. */
  def receiptsBase(norm: DataFrame): DataFrame =
    norm.select(col("blockHash"), col("blockTimestamp"),
        posexplode(col("chunks")).as(Seq("chunkPos", "c")))
      .select(col("blockHash"), col("blockTimestamp"),
        col("c.chunkHash").as("chunkHash"),
        explode(col("c.receipts")).as("r"))

  /** receipts (schema.rs:239-254). `lineage` maps receipt_id →
    * originated_from_transaction_hash (Lineage.resolve); unresolved
    * receipts are SKIPPED, mirroring non-strict mode
    * (receipts.rs:93-104).
    */
  def receipts(rBase: DataFrame, lineage: DataFrame): DataFrame =
    rBase.join(lineage, rBase("r.receiptId") === lineage("lineage_receipt_id"),
        "left")
      .filter(col("originated_from_transaction_hash").isNotNull)
      .select(
        col("r.receiptId").as("receipt_id"),
        col("blockHash").as("included_in_block_hash"),
        col("chunkHash").as("included_in_chunk_hash"),
        col("r.indexInChunk").as("index_in_chunk"),
        d20(col("blockTimestamp")).as("included_in_block_timestamp"),
        col("r.predecessorAccountId").as("predecessor_account_id"),
        col("r.receiverAccountId").as("receiver_account_id"),
        col("r.receiptKind").as("receipt_kind"),
        col("originated_from_transaction_hash"))

  /** action_receipts (schema.rs:98-107). */
  def actionReceipts(rBase: DataFrame): DataFrame =
    rBase.filter(col("r.receiptKind") === "ACTION")
      .select(
        col("r.receiptId").as("receipt_id"),
        col("r.signerAccountId").as("signer_account_id"),
        col("r.signerPublicKey").as("signer_public_key"),
        d38(col("r.gasPrice")).as("gas_price"))

  /** action_receipt_actions (schema.rs:61-77) with the denormalized
    * predecessor/receiver/timestamp (2021-04-28 migration).
    */
  def actionReceiptActions(rBase: DataFrame): DataFrame =
    flattenActions(
      rBase.filter(col("r.receiptKind") === "ACTION")
        .select(col("r.receiptId").as("receipt_id"),
          col("r.predecessorAccountId").as("receipt_predecessor_account_id"),
          col("r.receiverAccountId").as("receipt_receiver_account_id"),
          d20(col("blockTimestamp")).as("receipt_included_in_block_timestamp"),
          col("r.actions").as("actions")),
      Seq("receipt_id", "receipt_predecessor_account_id",
        "receipt_receiver_account_id", "receipt_included_in_block_timestamp"))
      .select(
        col("receipt_id"),
        col("index").as("index_in_action_receipt"),
        col("action_kind"), col("args"),
        col("receipt_predecessor_account_id"),
        col("receipt_receiver_account_id"),
        col("receipt_included_in_block_timestamp"),
        col("is_delegate_action"),
        col("delegate_parameters"),
        col("parent_index").as("delegate_parent_index_in_action_receipt"))

  /** action_receipt_input_data (schema.rs:79-86). */
  def actionReceiptInputData(rBase: DataFrame): DataFrame =
    rBase.filter(col("r.receiptKind") === "ACTION")
      .select(col("r.receiptId").as("input_to_receipt_id"),
        explode(col("r.inputDataIds")).as("input_data_id"))
      .select(col("input_data_id"), col("input_to_receipt_id"))

  /** action_receipt_output_data (schema.rs:88-96). */
  def actionReceiptOutputData(rBase: DataFrame): DataFrame =
    rBase.filter(col("r.receiptKind") === "ACTION")
      .select(col("r.receiptId").as("output_from_receipt_id"),
        explode(col("r.outputDataReceivers")).as("odr"))
      .select(
        col("odr.dataId").as("output_data_id"),
        col("output_from_receipt_id"),
        col("odr.receiverAccountId").as("receiver_account_id"))

  /** data_receipts (schema.rs:202-210). */
  def dataReceipts(rBase: DataFrame): DataFrame =
    rBase.filter(col("r.receiptKind") === "DATA")
      .select(
        col("r.dataId").as("data_id"),
        col("r.receiptId").as("receipt_id"),
        col("r.data").as("data"))

  /** Exploded receipt execution outcomes with block context. */
  def outcomesBase(norm: DataFrame): DataFrame =
    norm.select(col("blockHash"), col("blockTimestamp"),
      col("blockHeight"), explode(col("outcomes")).as("o"))

  /** execution_outcomes (schema.rs:222-237). */
  def executionOutcomes(oBase: DataFrame): DataFrame =
    oBase.select(
      col("o.receiptId").as("receipt_id"),
      col("blockHash").as("executed_in_block_hash"),
      d20(col("blockTimestamp")).as("executed_in_block_timestamp"),
      col("o.indexInChunk").as("index_in_chunk"),
      d20(col("o.gasBurnt")).as("gas_burnt"),
      d38(col("o.tokensBurnt")).as("tokens_burnt"),
      col("o.executorAccountId").as("executor_account_id"),
      col("o.status").as("status"),
      d20(col("o.shardId")).as("shard_id"))

  /** execution_outcome_receipts (schema.rs:212-220). */
  def executionOutcomeReceipts(oBase: DataFrame): DataFrame =
    oBase.select(
        col("o.receiptId").as("executed_receipt_id"),
        posexplode(col("o.producedReceiptIds"))
          .as(Seq("index_in_execution_outcome", "produced_receipt_id")))
      .select(col("executed_receipt_id"), col("index_in_execution_outcome"),
        col("produced_receipt_id"))

  /** account_changes (schema.rs:30-47; model account_changes.rs:24-82):
    * AccountUpdate/AccountDeletion state changes only, deletion zeroes
    * the balance snapshot. Duplicated state changes collapse per the
    * three partial unique indexes
    * (2021-05-27-154211_account_changes_unique_idx/up.sql:7-43): key =
    * (account, block hash, cause columns, reason, balance snapshot),
    * partitioned by the cause-null pattern; first insert wins. Rows
    * with BOTH cause columns set fall under no index and pass through.
    * Every key includes the block hash, so the dedup is block-local —
    * no cross-batch state, a plain window inside the batch.
    */
  def accountChanges(norm: DataFrame): DataFrame = {
    val rows = norm.select(col("blockHash"), col("blockTimestamp"),
        explode(col("stateChanges")).as("sc"))
      .filter(col("sc.valueType").isin("account_update", "account_deletion"))
      .select(
        col("sc.affectedAccountId").as("affected_account_id"),
        d20(col("blockTimestamp")).as("changed_in_block_timestamp"),
        col("blockHash").as("changed_in_block_hash"),
        when(col("sc.causeType") === "TRANSACTION_PROCESSING",
          col("sc.causeTxHash")).as("caused_by_transaction_hash"),
        col("sc.causeReceiptHash").as("caused_by_receipt_id"),
        col("sc.causeType").as("update_reason"),
        coalesce(d38(col("sc.amount")), lit(0).cast(D38))
          .as("affected_account_nonstaked_balance"),
        coalesce(d38(col("sc.locked")), lit(0).cast(D38))
          .as("affected_account_staked_balance"),
        coalesce(d20(col("sc.storageUsage")), lit(0).cast(D20))
          .as("affected_account_storage_usage"),
        col("sc.indexInBlock").as("index_in_block"))
    val bothSet = col("caused_by_transaction_hash").isNotNull &&
      col("caused_by_receipt_id").isNotNull
    val key = Seq("affected_account_id", "changed_in_block_hash",
      "caused_by_transaction_hash", "caused_by_receipt_id", "update_reason",
      "affected_account_nonstaked_balance", "affected_account_staked_balance",
      "affected_account_storage_usage").map(col)
    dedupPk(rows.filter(!bothSet), key,
        Seq(col("changed_in_block_timestamp"), col("index_in_block")))
      .unionByName(rows.filter(bothSet))
  }

  // ---- Mutable entity registries (P21/P22 + S7) -----------------------

  /** Account lifecycle events (accounts.rs:22-83): from SUCCESSFUL
    * outcomes' ACTION receipts — CreateAccount ⇒ created; Transfer to a
    * 64-char (implicit) id ⇒ created; DeleteAccount ⇒ deleted. `ord`
    * encodes the reference's HashMap insertion order (block, shard,
    * outcome index, action position).
    */
  def accountEvents(norm: DataFrame): DataFrame =
    norm.select(col("blockHeight").cast("long").as("h"),
        explode(col("outcomes")).as("o"))
      .filter(col("o.status").isin("SUCCESS_VALUE", "SUCCESS_RECEIPT_ID") &&
        col("o.receipt").isNotNull &&
        col("o.receipt.receiptKind") === "ACTION")
      .select(col("h"), col("o.shardId").as("s"),
        col("o.indexInChunk").as("oi"),
        col("o.receipt.receiverAccountId").as("account_id"),
        col("o.receipt.receiptId").as("receipt_id"),
        posexplode(col("o.receipt.actions")).as(Seq("p", "a")))
      .withColumn("ev",
        when(col("a.kind") === "CREATE_ACCOUNT", "CREATE")
          .when(col("a.kind") === "TRANSFER" && length(col("account_id")) === 64,
            "CREATE")
          .when(col("a.kind") === "DELETE_ACCOUNT", "DELETE"))
      .filter(col("ev").isNotNull)
      .select(col("account_id"), col("ev"), col("receipt_id"),
        col("h").as("block_height"),
        struct(col("h"), col("s"), col("oi"), col("p")).as("ord"))

  /** accounts registry (schema.rs:49-59): folds the event stream with
    * the reference's semantics — a later CREATE replaces the whole
    * entry (insert), a DELETE after the last CREATE annotates it
    * (and_modify), a DELETE with no later CREATE stands alone. The
    * cross-block guarded upsert (accounts.rs:93-193) collapses into the
    * same fold because `ord` leads with block height.
    */
  def accountsRegistry(events: DataFrame): DataFrame =
    events.groupBy(col("account_id"))
      .agg(
        max(when(col("ev") === "CREATE", col("ord"))).as("c_ord"),
        max_by(when(col("ev") === "CREATE", col("receipt_id")),
          when(col("ev") === "CREATE", col("ord"))).as("c_receipt"),
        max(when(col("ev") === "DELETE", col("ord"))).as("d_ord"),
        max_by(when(col("ev") === "DELETE", col("receipt_id")),
          when(col("ev") === "DELETE", col("ord"))).as("d_receipt"),
        max(col("block_height")).as("h"))
      .select(
        col("account_id"),
        col("c_receipt").as("created_by_receipt_id"),
        when(col("d_ord").isNotNull &&
            (col("c_ord").isNull || col("d_ord") > col("c_ord")),
          col("d_receipt")).as("deleted_by_receipt_id"),
        d20(col("h")).as("last_update_block_height"))

  /** Access-key lifecycle events (access_keys.rs:21-69): state changes
    * caused by ReceiptProcessing only.
    */
  def accessKeyEvents(norm: DataFrame): DataFrame =
    norm.select(col("blockHeight").cast("long").as("h"),
        explode(col("stateChanges")).as("sc"))
      .filter(col("sc.causeType") === "RECEIPT_PROCESSING" &&
        col("sc.valueType").isin("access_key_update", "access_key_deletion"))
      .select(
        col("sc.publicKey").as("public_key"),
        col("sc.affectedAccountId").as("account_id"),
        when(col("sc.valueType") === "access_key_update", "UPDATE")
          .otherwise("DELETE").as("ev"),
        col("sc.causeReceiptHash").as("receipt_id"),
        col("sc.akPermissionKind").as("permission_kind"),
        col("h").as("block_height"),
        struct(col("h"), col("sc.indexInBlock").as("i")).as("ord"))

  /** access_keys registry (schema.rs:16-28). DELETE with no prior
    * UPDATE gets the FULL_ACCESS placeholder (access_keys.rs:55-64).
    */
  def accessKeysRegistry(events: DataFrame): DataFrame =
    events.groupBy(col("public_key"), col("account_id"))
      .agg(
        max(when(col("ev") === "UPDATE", col("ord"))).as("u_ord"),
        max_by(when(col("ev") === "UPDATE", col("receipt_id")),
          when(col("ev") === "UPDATE", col("ord"))).as("u_receipt"),
        max_by(when(col("ev") === "UPDATE", col("permission_kind")),
          when(col("ev") === "UPDATE", col("ord"))).as("u_perm"),
        max(when(col("ev") === "DELETE", col("ord"))).as("d_ord"),
        max_by(when(col("ev") === "DELETE", col("receipt_id")),
          when(col("ev") === "DELETE", col("ord"))).as("d_receipt"),
        max(col("block_height")).as("h"))
      .select(
        col("public_key"), col("account_id"),
        col("u_receipt").as("created_by_receipt_id"),
        when(col("d_ord").isNotNull &&
            (col("u_ord").isNull || col("d_ord") > col("u_ord")),
          col("d_receipt")).as("deleted_by_receipt_id"),
        coalesce(col("u_perm"), lit("FULL_ACCESS")).as("permission_kind"),
        d20(col("h")).as("last_update_block_height"))
}
