package graft.near

/** Normalized StreamerMessage model — the typed boundary between the
  * one-pass JSON parser (BlockParser) and the relational transforms.
  *
  * All u64/u128 numerics ride as STRINGS here and are cast to
  * DecimalType(20,0)/(38,0) in the transforms (SURVEY §1.3): Spark
  * encoders would otherwise default BigDecimal to (38,18), and JSON
  * carries u128 as strings anyway.
  *
  * Enum-bearing fields are pre-normalized to the reference's
  * SCREAMING_SNAKE_CASE database values (`database/src/models/enums.rs`).
  */
case class NormInnerAction(kind: String, args: String)

/** One action, already serialized per the reference's
  * `extract_action_type_and_value_from_action_view`
  * (`database/src/models/serializers.rs:64-131`): `args` is canonical
  * (sorted-key) JSON; for Delegate actions `args` is `{}` and the
  * parameters + inner actions are carried alongside (flattening into
  * rows happens in the transform, `transactions.rs:196-264`).
  */
case class NormAction(
    kind: String,
    args: String,
    delegateParameters: Option[String],
    inner: Option[Seq[NormInnerAction]])

case class NormTx(
    transactionHash: String,
    indexInChunk: Int,
    signerAccountId: String,
    signerPublicKey: String,
    nonce: String,
    receiverAccountId: String,
    signature: String,
    status: String,
    convertedIntoReceiptId: String,
    receiptConversionGasBurnt: String,
    receiptConversionTokensBurnt: String,
    actions: Seq[NormAction])

case class NormDataReceiver(dataId: String, receiverAccountId: String)

case class NormReceipt(
    receiptId: String,
    indexInChunk: Int,
    predecessorAccountId: String,
    receiverAccountId: String,
    receiptKind: String, // ACTION | DATA
    // Action variant
    signerAccountId: Option[String],
    signerPublicKey: Option[String],
    gasPrice: Option[String],
    actions: Option[Seq[NormAction]],
    inputDataIds: Option[Seq[String]],
    outputDataReceivers: Option[Seq[NormDataReceiver]],
    // Data variant
    dataId: Option[String],
    data: Option[Array[Byte]])

case class NormChunk(
    chunkHash: String,
    shardId: Long,
    signature: String,
    gasLimit: String,
    gasUsed: String,
    author: String,
    transactions: Seq[NormTx],
    receipts: Seq[NormReceipt])

/** Outcome of executing a receipt (shard.receipt_execution_outcomes[i])
  * with the receipt it executed — the receipt is needed for NEP events
  * (contract id) and the accounts lifecycle.
  */
case class NormOutcome(
    receiptId: String,
    indexInChunk: Int,
    shardId: Long,
    gasBurnt: String,
    tokensBurnt: String,
    executorAccountId: String,
    status: String,
    logs: Seq[String],
    producedReceiptIds: Seq[String],
    receipt: Option[NormReceipt])

case class NormStateChange(
    indexInBlock: Int,
    causeType: String, // SCREAMING_SNAKE reason kind
    causeTxHash: Option[String],
    causeReceiptHash: Option[String],
    valueType: String, // account_update | account_deletion | access_key_update | access_key_deletion | other
    affectedAccountId: String,
    publicKey: Option[String],
    // account_update payload
    amount: Option[String],
    locked: Option[String],
    storageUsage: Option[String],
    // access_key_update payload
    akNonce: Option[String],
    akPermissionKind: Option[String], // FULL_ACCESS | FUNCTION_CALL
    akPermission: Option[String]) // serialized AccessKeyView JSON (serializers.rs:12-41)

case class NormBlock(
    blockHash: String,
    prevBlockHash: String,
    blockHeight: String,
    blockTimestamp: String,
    totalSupply: String,
    gasPrice: String,
    author: String,
    chunks: Seq[NormChunk],
    outcomes: Seq[NormOutcome],
    stateChanges: Seq[NormStateChange])
