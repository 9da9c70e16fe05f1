package graft.catalog

/** Connection/registration parameters for Spectrum publishing — the
  * reference's redshift_params dict (publish_parq.py:94
  * `validate_redshift_params`). graft validates and normalizes them the
  * same way; actual DB I/O stays out of the engine (see [[SpectrumDdl]]).
  */
final case class RedshiftParams(schemaName: String, tableName: String,
                                iamRole: String, region: String, clusterId: String,
                                host: String, port: String, dbName: String,
                                ec2User: String = "")

object RedshiftParams {

  /** Validate + normalize (lowercase schema/table names) exactly as the
    * reference does; throws on blank required fields.
    */
  def validate(p: RedshiftParams): RedshiftParams = {
    val required = Seq(
      "schema_name" -> p.schemaName, "table_name" -> p.tableName,
      "iam_role" -> p.iamRole, "region" -> p.region,
      "cluster_id" -> p.clusterId, "host" -> p.host,
      "port" -> p.port, "db_name" -> p.dbName)
    required.foreach { case (k, v) =>
      require(v != null && v.nonEmpty, s"No value assigned for param $k.")
    }
    p.copy(schemaName = p.schemaName.toLowerCase, tableName = p.tableName.toLowerCase)
  }
}
