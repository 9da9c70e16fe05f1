package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.naming.S3Naming

/** S3 naming validation, ported from tests/test_s3_naming_helper.py. */
class S3NamingSpec extends AnyFunSuite {

  test("bucket names (s3_naming_helper.py:51)") {
    assert(S3Naming.validateBucketName("valid-bucket-name").isEmpty)
    assert(S3Naming.validateBucketName("good.name.1").isEmpty)
    assert(S3Naming.validateBucketName("9starts-with-digit").isEmpty)
    assert(S3Naming.validateBucketName("ab").isDefined)           // too short
    assert(S3Naming.validateBucketName("a" * 64).isDefined)       // too long
    assert(S3Naming.validateBucketName("Has-Upper").isDefined)
    assert(S3Naming.validateBucketName("bad_underscore").isDefined)
    assert(S3Naming.validateBucketName("ends-with-dash-").isDefined)
    assert(S3Naming.validateBucketName("double..period").isDefined)
    assert(S3Naming.validateBucketName("dash.-next").isDefined)
    assert(S3Naming.validateBucketName("-starts-dash").isDefined)
    intercept[IllegalArgumentException] {
      S3Naming.requireValidBucketName("BAD")
    }
  }

  test("key parts (s3_naming_helper.py:6)") {
    assert(S3Naming.validatePart("some_key-part.txt").isEmpty)
    assert(S3Naming.validatePart("a/b/c").isEmpty)
    assert(S3Naming.validatePart("a/b", allowPrefix = false).isDefined)
    assert(S3Naming.validatePart("").isDefined)
    assert(S3Naming.validatePart("bad colon:here").isDefined)
  }

  test("full s3 paths (s3_naming_helper.py:90)") {
    assert(S3Naming.validateS3Path("s3://my-bucket/some/key").isEmpty)
    assert(S3Naming.validateS3Path("http://my-bucket/key").isDefined)
    assert(S3Naming.validateS3Path("s3://BAD/key").isDefined)
    assert(S3Naming.validateS3Path("s3://my-bucket/bad~key").isDefined)
  }
}
