package graft.naming

/** S3 bucket / key-part / full-path validation — re-expression of the
  * reference's `s3_naming_helper.py`. Pure functions: `None` = valid,
  * `Some(reason)` = invalid.
  */
object S3Naming {

  private val SafeChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet ++
      Set('!', '-', '_', '.', '*', '(', ')', '=')

  /** Validate one key part (s3_naming_helper.py:6). */
  def validatePart(value: String, allowPrefix: Boolean = true): Option[String] = {
    if (!allowPrefix && value.contains('/')) return Some("prefix dissalowed")
    if (value.isEmpty) return Some("path parts must be 1 or more characters")
    value.split('/').filter(_.nonEmpty).foreach { part =>
      part.find(!SafeChars.contains(_)).foreach { c =>
        return Some(s"$c is not an allowed character.")
      }
    }
    None
  }

  /** Validate a bucket name (s3_naming_helper.py:51). */
  def validateBucketName(name: String): Option[String] =
    if (name.length < 3 || name.length > 63)
      Some("bucket name must be between 3 and 63 chars")
    else if (name.exists(_.isUpper))
      Some("bucket name cannot contain upper case characters")
    else if (!name.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == '-' || c == '.'))
      Some("bucket name can only contain lower case chars, numbers, dashes and periods")
    else if (name.endsWith("-"))
      Some("bucket name cannot end with a dash")
    else if (name.contains(".."))
      Some("bucket name cannot include double periods")
    else if (name.contains(".-") || name.contains("-."))
      Some("bucket name cannot have dashes next to periods")
    else if (hasBadCharAfterPeriod(name))
      Some("bucket name must have only a letter or a number after a period")
    else if (!(name.head.isLetter || name.head.isDigit))
      Some("bucket name must start with a number or letter")
    else None

  private def hasBadCharAfterPeriod(name: String): Boolean = {
    val idxs = name.zipWithIndex.collect { case ('.', i) => i }
    idxs.exists(i => i + 1 < name.length && !(name(i + 1).isDigit || (name(i + 1) >= 'a' && name(i + 1) <= 'z')))
  }

  /** Throwing form, matching the reference's `validate_bucket_name`
    * (s3_naming_helper.py:33).
    */
  def requireValidBucketName(name: String): Unit =
    validateBucketName(name).foreach(m => throw new IllegalArgumentException(m))

  /** Validate a full `s3://bucket/key...` URI (s3_naming_helper.py:90). */
  def validateS3Path(path: String): Option[String] =
    if (!path.startsWith("s3://")) Some("bucket path must have arn prefix (s3://)")
    else {
      val parts = path.drop(5).split('/')
      validateBucketName(parts.head).orElse(
        parts.tail.iterator.flatMap(p => validatePart(p)).nextOption())
    }
}
