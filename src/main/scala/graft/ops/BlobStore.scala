package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Content-addressed blob sidecar store — the reference's blob path
  * (json_to_sql/mapping_policy.py:987 archive_blob_file: blob -> md5
  * keyed `<hash>.blob` file under !blobs_dir + MongoDB copy, row keeps
  * the reference id; retrieval `dbms/mongodb_dbms.py:379 store_file` /
  * `:467 put_from_rest`) re-expressed for Spark: the heavy binary column
  * leaves the row before it ever shuffles, replaced by a deterministic
  * content hash; analytics run on the slim rows and re-attach payloads
  * only at the edge that needs them.
  *
  * Scale shape: externalize/hydrate are `mapPartitions` — embarrassingly
  * parallel, no shuffle, constant memory per partition. `blobsDir` is a
  * shared filesystem/object-store prefix on a real cluster (every
  * executor writes/reads its own partition's blobs); writes are
  * idempotent because the name IS the content hash, which also gives
  * exact blob-level dedup for free (the reference's ignore_duplicate
  * flag).
  */
object BlobStore {

  private def md5hex(bytes: Array[Byte], salt: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(salt.getBytes("UTF-8"))
    d.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Replace `payloadCol` (binary) with a `<dbms>.<table>.<md5>.blob`
    * reference string, writing each distinct payload once under
    * `blobsDir`. NULL payloads map to a NULL reference. */
  def externalize(df: DataFrame, payloadCol: String, dbms: String,
      table: String, blobsDir: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    require(df.schema(idx).dataType == BinaryType,
      s"$payloadCol must be binary")
    val outSchema = StructType(df.schema.fields.zipWithIndex.map {
      case (f, i) => if (i == idx) f.copy(dataType = StringType) else f
    })
    val enc = RowEncoder.encoderFor(outSchema)
    val salt = s"$dbms.$table"
    df.mapPartitions { rows =>
      val dir = Paths.get(blobsDir)
      Files.createDirectories(dir)
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(idx) = r.get(idx) match {
          case null => null
          case bytes: Array[Byte] =>
            val hash = md5hex(bytes, salt)
            val target = dir.resolve(s"$hash.blob")
            // content-addressed: existing file == identical bytes
            if (!Files.exists(target)) {
              val tmp = dir.resolve(s".$hash.${java.util.UUID.randomUUID}")
              Files.write(tmp, bytes)
              try Files.move(tmp, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch { case _: java.nio.file.FileAlreadyExistsException =>
                Files.deleteIfExists(tmp) }
            }
            s"$salt.$hash.blob"
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc)
  }

  /** Re-attach payloads: `refCol` (`<dbms>.<table>.<md5>.blob`) becomes
    * the binary payload read from `blobsDir`; unknown refs -> NULL. */
  def hydrate(df: DataFrame, refCol: String, blobsDir: String): DataFrame = {
    val idx = df.schema.fieldIndex(refCol)
    val outSchema = StructType(df.schema.fields.zipWithIndex.map {
      case (f, i) => if (i == idx) f.copy(dataType = BinaryType) else f
    })
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val dir = Paths.get(blobsDir)
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(idx) = r.get(idx) match {
          case null => null
          case ref: String =>
            val hash = ref.stripSuffix(".blob")
              .substring(ref.stripSuffix(".blob").lastIndexOf('.') + 1)
            val p = dir.resolve(s"$hash.blob")
            if (Files.exists(p)) Files.readAllBytes(p) else null
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc)
  }
}
