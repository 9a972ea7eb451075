/* dummy predefined-handle globals for the single-rank stub */
struct ompi_communicator_t { int dummy; };
struct ompi_datatype_t { int dummy; };
struct ompi_communicator_t ompi_mpi_comm_world = {0};
struct ompi_communicator_t ompi_mpi_comm_null = {1};
struct ompi_datatype_t ompi_mpi_int = {4};
struct ompi_datatype_t ompi_mpi_float = {4};
struct ompi_datatype_t ompi_mpi_int8_t = {1};
struct ompi_datatype_t ompi_mpi_int32_t = {4};
struct ompi_datatype_t ompi_mpi_uint16_t = {2};
struct ompi_datatype_t ompi_mpi_byte = {1};
